"""X1-X5: per-document table extraction (lattice + stream + merge + filter).

Placeholder in this milestone — the geometric lattice detector over
content-stream vector strokes (SURVEY.md §2.3) lands in M3. The
pipeline contract (tables_json column, num_tables) is stable already.
"""

from __future__ import annotations

from typing import Optional, Tuple


def extract_tables_json(payload: bytes) -> Tuple[Optional[str], int]:
    """PDF bytes → (JSON array of Table dicts, count). M3 work."""
    return None, 0
