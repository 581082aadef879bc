"""Pluggable RPC source + deterministic mock chain.

The reference pulls from Infura JSON-RPC (eth_getBlockByNumber,
eth_getLogs, eth_getTransactionReceipt, eth_blockNumber — SURVEY.md
§2.C). The harness has no network, so the client is a protocol; the
production implementation would wrap HTTP JSON-RPC, and `MockChain` is a
fully deterministic in-process chain used by tests and fixtures.

MockChain is picklable and stateless-per-call (every block's content is a
pure function of (seed, block_number)), so executors can regenerate any
range independently — exactly the property a partitioned backfill needs.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Callable, Protocol

from ..abi.schema import TableSpec
from ..decode.abi_codec import encode_abi


class RpcClient(Protocol):
    def block_number(self) -> int: ...
    def get_block(self, n: int) -> dict: ...
    def get_logs(self, from_block: int, to_block: int, address: str) -> list[dict]: ...
    def get_transaction_receipt(self, tx_hash: str) -> dict: ...


GENESIS_TS = 1438269988  # first mainnet block era; +13s per block


def _h(rng: random.Random, nbytes: int) -> str:
    return "".join(rng.choices("0123456789abcdef", k=2 * nbytes))


@dataclass
class ContractSim:
    """One simulated contract: address + event/call specs with value
    generators. value_gen(spec, rng) -> list of python values matching
    spec.param_types."""

    address: str
    specs: list[TableSpec]
    value_gen: Callable[[TableSpec, random.Random], list]
    logs_per_block: float = 0.5  # expected emitted logs per block
    start_block: int = 0


@dataclass
class MockChain:
    head: int
    contracts: list[ContractSim] = field(default_factory=list)
    seed: int = 42

    def block_number(self) -> int:
        return self.head

    def get_block(self, n: int) -> dict:
        rng = random.Random(f"{self.seed}:block:{n}")
        gas_limit = 30_000_000
        return {
            "number": n,
            "hash": "0x" + _h(rng, 32),
            "miner": "0x" + _h(rng, 20),
            "nonce": "0x" + _h(rng, 8),
            "gasLimit": gas_limit,
            "gasUsed": rng.randrange(0, gas_limit),
            "difficulty": rng.randrange(10**10, 2 * 10**10),
            "extraData": "0x" + _h(rng, rng.randrange(0, 32)),
            "timestamp": GENESIS_TS + 13 * n,
            "size": rng.randrange(500, 80_000),
        }

    def _logs_for_block(self, n: int, contract: ContractSim) -> list[dict]:
        rng = random.Random(f"{self.seed}:logs:{contract.address}:{n}")
        if n < contract.start_block or not contract.specs:
            return []
        k = int(contract.logs_per_block)
        if rng.random() < contract.logs_per_block - k:
            k += 1
        out = []
        block_hash = self.get_block(n)["hash"]
        for log_index in range(k):
            spec = rng.choice(contract.specs)
            values = contract.value_gen(spec, rng)
            tx_index = log_index // 2  # some logs share a transaction
            tx_rng = random.Random(f"{self.seed}:tx:{n}:{tx_index}")
            if spec.kind == "evt":
                topics = [spec.signature]
                data_types, data_vals = [], []
                for typ, ix, v in zip(spec.param_types, spec.indexed, values):
                    if ix:
                        topics.append("0x" + encode_abi([typ], [v]).hex())
                    else:
                        data_types.append(typ)
                        data_vals.append(v)
                data = "0x" + encode_abi(data_types, data_vals).hex()
            else:
                # call logs: topic0 = padded selector; data = selector + args
                topics = [spec.signature]
                data = "0x" + spec.signature[2:10] + encode_abi(spec.param_types, values).hex()
            out.append(
                {
                    "address": contract.address,
                    "topics": topics,
                    "data": data,
                    "blockNumber": n,
                    "blockHash": block_hash,
                    "logIndex": log_index,
                    "transactionIndex": tx_index,
                    "transactionHash": "0x" + _h(tx_rng, 32),
                }
            )
        return out

    def get_logs(self, from_block: int, to_block: int, address: str) -> list[dict]:
        by_addr = {c.address: c for c in self.contracts}
        contract = by_addr.get(address)
        if contract is None:
            return []
        out = []
        for n in range(from_block, to_block + 1):
            out.extend(self._logs_for_block(n, contract))
        return out

    def get_transaction_receipt(self, tx_hash: str) -> dict:
        rng = random.Random(f"{self.seed}:receipt:{tx_hash}")
        return {"logs": [{"data": "0x" + _h(rng, 64), "transactionHash": tx_hash}]}
