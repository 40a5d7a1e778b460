"""Job configuration helpers (reference: ukis_pysat/file.py:14-26)."""

from __future__ import annotations

import os
from typing import Union


def env_get(key: str, boolean: bool = False) -> Union[str, bool]:
    """Required environment variable with optional bool coercion
    (true/y/yes/1, case-insensitive — file.py:23 semantics)."""
    try:
        if boolean:
            return os.environ[key].lower() in ["true", "y", "yes", "1"]
        return os.environ[key]
    except KeyError:
        raise KeyError(f"No environment variable {key} found")
