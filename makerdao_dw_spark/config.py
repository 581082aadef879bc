"""Contract-registry config: parses the reference's HOCON config format.

The reference drives everything from `config.conf` (/root/reference/
config.conf, functions.py:16-18): a HOCON tree of
`<schema> { <contract> { addresses, creationBlock, blocksStep } }`
blocks assembled via `include`, plus global defaults (`blocksStep`) and
db/infura settings. A reference user switches engines by bringing that
file, so this module reads the same format — a dependency-free parser
for the HOCON subset those files use (nested blocks, `=`/`:` assigns,
single-line arrays, `#`/`//` comments, includes, empty values).

Divergence from the reference, on purpose: secrets (infura_key,
db.password) are only ever read from the config/environment — the
reference committed an API key (functions.py:28).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Any

_ASSIGN = re.compile(r"^([A-Za-z_][\w.-]*)\s*[:=]\s*(.*)$")
_BLOCK = re.compile(r"^([A-Za-z_][\w.-]*)\s*\{\s*$")
_INCLUDE = re.compile(r'^include\s+"([^"]+)"\s*$')


def _strip_comment(line: str) -> str:
    out = []
    in_q = False
    i = 0
    while i < len(line):
        c = line[i]
        if c == '"':
            in_q = not in_q
        if not in_q and (c == "#" or line[i : i + 2] == "//"):
            break
        out.append(c)
        i += 1
    return "".join(out).rstrip()


def _parse_value(raw: str) -> Any:
    raw = raw.strip()
    if raw == "":
        return ""
    if raw.startswith("["):
        inner = raw.strip()[1:-1]
        return [_parse_value(x) for x in inner.split(",") if x.strip() != ""]
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        return raw[1:-1]
    if raw.startswith("'") and raw.endswith("'") and len(raw) >= 2:
        return raw[1:-1]
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    if raw in ("true", "false"):
        return raw == "true"
    return raw


def parse_hocon(path: str, _root_dir: str | None = None) -> dict:
    """Parse a reference-format HOCON file into a nested dict.

    Includes resolve relative to the ROOT file's directory (matching how
    the reference's config.conf refers to "conf/makermcd.conf"); missing
    include targets are skipped (the reference ships config.conf that
    includes dev.conf/prod.conf users create locally).
    """
    root_dir = _root_dir or os.path.dirname(os.path.abspath(path))
    tree: dict = {}
    stack: list[dict] = [tree]
    with open(path, encoding="utf-8") as fh:
        lines = iter(fh)
        for raw_line in lines:
            line = _strip_comment(raw_line).strip()
            if not line:
                continue
            # multi-line arrays (per-element comments allowed): consume
            # until brackets balance
            while line.count("[") > line.count("]"):
                try:
                    line += " " + _strip_comment(next(lines)).strip()
                except StopIteration:
                    raise ValueError(f"{path}: unterminated array") from None
            m = _INCLUDE.match(line)
            if m:
                inc = os.path.join(root_dir, m.group(1))
                if os.path.exists(inc):
                    _merge(stack[-1], parse_hocon(inc, _root_dir=root_dir))
                continue
            m = _BLOCK.match(line)
            if m:
                child = stack[-1].setdefault(m.group(1), {})
                stack.append(child)
                continue
            if line == "}":
                if len(stack) == 1:
                    raise ValueError(f"{path}: unbalanced closing brace")
                stack.pop()
                continue
            m = _ASSIGN.match(line)
            if m:
                stack[-1][m.group(1)] = _parse_value(m.group(2))
                continue
            raise ValueError(f"{path}: unparseable line: {raw_line!r}")
    if len(stack) != 1:
        raise ValueError(f"{path}: unbalanced open brace")
    return tree


def _merge(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


# DSSProxyActions: the hard-coded receipt-search target of the reference's
# proxy_actions path (eth-contract.py:48,55).
DSS_PROXY_ACTIONS = "0x82ecd135dce65fbc6dbdd0e4237e0af93ffd5038"


@dataclass(frozen=True)
class ContractConf:
    schema: str
    contract: str
    addresses: list[str]
    creation_block: int
    blocks_step: int
    # non-None => ingest via the receipt-search path (A3): dedup logs by tx,
    # fetch each receipt, keep txs whose first receipt log mentions this
    # address. proxy_actions uses DSSProxyActions (eth-contract.py:47-58);
    # gov_actions searches for its own address (conf/makermcd.conf:57 marks
    # it broken upstream with exactly that fix described).
    receipt_search_address: str | None = None


class Registry:
    """The reference's contract registry semantics (eth-contract.py:16-31):
    per-contract blocksStep with global fallback, addresses list,
    creationBlock; contracts grouped under schema namespaces."""

    def __init__(self, conf: dict):
        self.conf = conf
        self.contracts = conf.get("contracts", {})
        self.default_blocks_step = int(conf.get("blocksStep", 100))

    @classmethod
    def load(cls, path: str) -> "Registry":
        return cls(parse_hocon(path))

    def schemas(self) -> list[str]:
        return sorted(self.contracts)

    def contract_names(self, schema: str) -> list[str]:
        return sorted(self.contracts.get(schema, {}))

    def get(self, schema: str, contract: str) -> ContractConf:
        try:
            c = self.contracts[schema][contract]
        except KeyError:
            raise KeyError(f"contract {schema}.{contract} not in registry") from None
        addresses = [a.lower() for a in c["addresses"]]
        if "receiptSearchAddress" in c:  # explicit override, ours
            receipt = str(c["receiptSearchAddress"]).lower()
        elif contract == "proxy_actions":
            receipt = DSS_PROXY_ACTIONS
        elif contract == "gov_actions":
            receipt = addresses[0]
        else:
            receipt = None
        return ContractConf(
            schema=schema,
            contract=contract,
            addresses=addresses,
            creation_block=int(c["creationBlock"]),
            blocks_step=int(c.get("blocksStep", self.default_blocks_step)),
            receipt_search_address=receipt,
        )

    def db(self) -> dict:
        return dict(self.conf.get("db", {}))
