"""Decoder unit tests: codec round-trips, progressive-offset calldata,
indexed-event reassembly, overflow policy, unknown-topic drop."""

from __future__ import annotations

from decimal import Decimal

from makerdao_dw_spark.abi.schema import TableSpec, compile_contract
from makerdao_dw_spark.decode.abi_codec import decode_abi, encode_abi
from makerdao_dw_spark.decode.decoders import (
    decode_calldata,
    decode_event,
    decode_logs_for_table,
    extract_methodid,
)

FROB_ABI = {
    "type": "function",
    "stateMutability": "nonpayable",
    "name": "frob",
    "inputs": [
        {"name": "i", "type": "bytes32"},
        {"name": "u", "type": "address"},
        {"name": "v", "type": "address"},
        {"name": "w", "type": "address"},
        {"name": "dink", "type": "int256"},
        {"name": "dart", "type": "int256"},
    ],
}

TRANSFER_ABI = {
    "type": "event",
    "anonymous": False,
    "name": "Transfer",
    "inputs": [
        {"name": "src", "type": "address", "indexed": True},
        {"name": "dst", "type": "address", "indexed": True},
        {"name": "wad", "type": "uint256", "indexed": False},
    ],
}


def _specs():
    return compile_contract("t", [FROB_ABI, TRANSFER_ABI])


def test_codec_roundtrip_all_types():
    types = ["address", "bytes", "bytes4", "bytes32", "int256", "uint256",
             "uint16", "uint8", "bool", "string", "address[]", "uint256[]"]
    values = [
        "0a" * 20, b"\x01\x02\x03", b"\xde\xad\xbe\xef", b"ETH-A".ljust(32, b"\x00"),
        -(10**30), 10**30, 65535, 255, True, "hello world",
        ["11" * 20, "22" * 20], [1, 2, 10**20],
    ]
    decoded = decode_abi(types, encode_abi(types, values))
    assert decoded == values


def test_calldata_roundtrip_and_progressive_offset():
    frob, _ = _specs()
    vals = [b"ETH-A".ljust(32, b"\x00"), "aa" * 20, "bb" * 20, "cc" * 20, -(10**18), 5 * 10**18]
    payload = frob.signature[2:10] + encode_abi(frob.param_types, vals).hex()
    assert decode_calldata(frob, "0x" + payload) == vals
    # provider-prepended padding: multiples of 4 bytes before the selector
    assert decode_calldata(frob, "0x" + "00" * 12 + payload) == vals
    # garbage that never contains the selector -> None (skip row)
    assert decode_calldata(frob, "0x" + "11" * 40) is None
    # empty calldata -> all-null params (reference behavior for '0x')
    assert decode_calldata(frob, "0x") == [None] * 6
    assert extract_methodid("0x" + payload) == frob.signature


def test_event_decode_indexed_params():
    _, transfer = _specs()
    topics = [
        transfer.signature,
        "0x" + encode_abi(["address"], ["11" * 20]).hex(),
        "0x" + encode_abi(["address"], ["22" * 20]).hex(),
    ]
    data = "0x" + encode_abi(["uint256"], [7 * 10**18]).hex()
    assert decode_event(transfer, topics, data) == ["11" * 20, "22" * 20, 7 * 10**18]


def _raw_log_df(spark, rows):
    from makerdao_dw_spark.ingest.pipeline import RAW_LOG_SCHEMA

    return spark.createDataFrame(rows, RAW_LOG_SCHEMA)


def test_spark_decode_drops_unknown_topics_and_nulls_overflow(spark):
    """Unknown topic0 must be dropped (the reference mis-filed it into the
    previous table — eth-contract.py:93-97); uint256 > decimal(38) -> null."""
    _, transfer = _specs()
    big = 10**45  # exceeds decimal(38,0)
    rows = [
        {
            "address": "0x" + "ab" * 20,
            "topics": [
                transfer.signature,
                "0x" + encode_abi(["address"], ["11" * 20]).hex(),
                "0x" + encode_abi(["address"], ["22" * 20]).hex(),
            ],
            "data": "0x" + encode_abi(["uint256"], [big]).hex(),
            "block_number": 10, "block_hash": "0x" + "00" * 32,
            "log_index": 0, "transaction_index": 0, "transaction_hash": "0x" + "01" * 32,
        },
        {  # unknown topic0: must not appear in any output
            "address": "0x" + "ab" * 20,
            "topics": ["0x" + "ff" * 32],
            "data": "0x",
            "block_number": 11, "block_hash": "0x" + "00" * 32,
            "log_index": 0, "transaction_index": 0, "transaction_hash": "0x" + "02" * 32,
        },
    ]
    out = decode_logs_for_table(_raw_log_df(spark, rows), transfer).collect()
    assert len(out) == 1
    r = out[0]
    assert r["src"] == "11" * 20 and r["dst"] == "22" * 20
    assert r["wad"] is None  # overflow-to-null policy (SURVEY §1.3)
    assert r["address"] == "ab" * 20  # 0x stripped, lowercase


def test_spark_decode_within_decimal_range(spark):
    _, transfer = _specs()
    rows = [{
        "address": "0x" + "ab" * 20,
        "topics": [
            transfer.signature,
            "0x" + encode_abi(["address"], ["11" * 20]).hex(),
            "0x" + encode_abi(["address"], ["22" * 20]).hex(),
        ],
        "data": "0x" + encode_abi(["uint256"], [123 * 10**18]).hex(),
        "block_number": 12, "block_hash": "0x" + "00" * 32,
        "log_index": 3, "transaction_index": 1, "transaction_hash": "0x" + "03" * 32,
    }]
    (r,) = decode_logs_for_table(_raw_log_df(spark, rows), transfer).collect()
    assert r["wad"] == Decimal(123 * 10**18)
    assert r["log_index"] == 3


EXECUTE_ABI = {
    "type": "function",
    "stateMutability": "payable",
    "name": "execute",
    "inputs": [
        {"name": "_target", "type": "address"},
        {"name": "_data", "type": "bytes"},
    ],
}


def test_proxy_redispatch_end_to_end(spark):
    """execute(target, bytes) wrappers re-dispatch to the embedded
    function's table (reference eth-contract.py:107-111); undecodable
    wrappers are dropped, never mis-filed."""
    from makerdao_dw_spark.decode.decoders import redispatch_proxy_calls
    from makerdao_dw_spark.ingest.pipeline import RAW_LOG_SCHEMA

    proxy_spec = compile_contract("proxy", [EXECUTE_ABI])[0]
    frob_spec = compile_contract("vat", [FROB_ABI])[0]

    ilk = b"ETH-A".ljust(32, b"\x00")
    addr = "ab" * 20
    inner = frob_spec.signature[2:10] + encode_abi(
        frob_spec.param_types, [ilk, addr, addr, addr, 7, -5]
    ).hex()
    wrapper = proxy_spec.signature[2:10] + encode_abi(
        proxy_spec.param_types, [addr, bytes.fromhex(inner)]
    ).hex()

    def log(i, data):
        return {
            "address": "0x" + addr, "topics": [proxy_spec.signature], "data": data,
            "block_number": 100 + i, "block_hash": "b" * 64, "log_index": i,
            "transaction_index": 0, "transaction_hash": f"{i:064x}",
        }

    rows = [
        log(0, "0x" + wrapper),          # valid wrapper -> frob row
        log(1, "0xdeadbeef"),            # undecodable wrapper -> dropped
        log(2, "0x" + wrapper[:40]),     # truncated -> dropped
    ]
    raw = spark.createDataFrame(rows, RAW_LOG_SCHEMA)

    redis = redispatch_proxy_calls(raw, proxy_spec)
    out = decode_logs_for_table(redis, frob_spec).collect()
    assert len(out) == 1
    r = out[0]
    assert r["block_number"] == 100 and r["i"] == ilk
    assert r["dink"] == Decimal(7) and r["dart"] == Decimal(-5)
