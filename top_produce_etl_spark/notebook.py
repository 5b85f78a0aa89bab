"""Notebook bootstrap helper (reference parity).

The reference ships a tiny dev nicety that prepends the project root
to ``sys.path`` so notebooks can import the package from a source
checkout (reference ``notebook_utils.py:5-13``). The installable
package makes this mostly unnecessary, but the helper exists so a
user of the reference can switch 1:1.
"""

from __future__ import annotations

import os
import sys


def add_project_root_to_path(levels_up: int = 1) -> str:
    """Prepend the directory ``levels_up`` above this file to
    ``sys.path`` (idempotent). Returns the path added."""
    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), *[".."] * levels_up)
    )
    if root not in sys.path:
        sys.path.insert(0, root)
    return root
