"""Notebook/dev-environment conveniences.

Parity with the reference's notebook helper
(``src/utils/notebook_utils.py:5-13``: walk up from the cwd until a
directory containing a marker subdir is found, then add it to
``sys.path``) — the dev workflow its ``.gitignore``'s ``notebooks/``
entry implies. Re-expressed with a bounded walk, an explicit
not-found error, and idempotent insertion.
"""

from __future__ import annotations

import os
import sys


def add_project_root_to_path(marker: str = "top_produce_etl_spark") -> str:
    """Find the nearest ancestor of the cwd that contains ``marker``
    and prepend it to ``sys.path`` (idempotent). Returns the root.

    Lets a notebook anywhere inside the repo ``import
    top_produce_etl_spark`` without installing the package — the
    reference's helper did the same keyed on its ``src`` dir.
    """
    cur = os.path.abspath(os.getcwd())
    while True:
        if os.path.isdir(os.path.join(cur, marker)):
            if cur not in sys.path:
                sys.path.insert(0, cur)
            return cur
        parent = os.path.dirname(cur)
        if parent == cur:  # filesystem root reached
            raise FileNotFoundError(
                f"no ancestor of {os.getcwd()!r} contains {marker!r}"
            )
        cur = parent
