"""ABI file loader.

The reference caches Etherscan ABIs via `str(abi)` (python-repr with
single quotes — /root/reference/functions.py:32), so checked-in .abi
files are a mix of JSON and repr format (observed: vat.abi,
transactions.abi, shelf.abi are repr). This loader accepts both.
"""

from __future__ import annotations

import ast
import json
from pathlib import Path


def parse_abi_text(text: str) -> list[dict]:
    text = text.strip()
    try:
        abi = json.loads(text)
    except json.JSONDecodeError:
        abi = ast.literal_eval(text)  # python-repr cache format
    if not isinstance(abi, list):
        raise ValueError("ABI must be a JSON array of entries")
    return abi


def load_abi(path: str | Path) -> list[dict]:
    return parse_abi_text(Path(path).read_text())
