"""ABI compiler parity tests against all 29 checked-in reference ABIs.

SURVEY.md §1.2/§2.A5: 29 ABI files across 5 schemas must compile to
305 call tables + 107 evt tables; overload suffixes follow ABI order
(first bare, then name0, name1, ...); repr-format ABI files load.
"""

from __future__ import annotations

import glob
import os

import pytest

from makerdao_dw_spark.abi.loader import load_abi
from makerdao_dw_spark.abi.schema import SchemaCompiler, compile_contract, dispatch_index

REF_CONF = "/root/reference/conf"

ABI_FILES = sorted(glob.glob(os.path.join(REF_CONF, "*", "*.abi")))


def test_found_all_29_abis():
    assert len(ABI_FILES) == 29


def test_repr_format_abis_load():
    for name in ("makermcd/vat.abi", "ethereum/transactions.abi", "centrifuge/shelf.abi"):
        abi = load_abi(os.path.join(REF_CONF, name))
        assert isinstance(abi, list) and all(isinstance(e, dict) for e in abi)


def test_total_table_inventory():
    calls = evts = 0
    for path in ABI_FILES:
        contract = os.path.splitext(os.path.basename(path))[0]
        specs = compile_contract(contract, load_abi(path))
        calls += sum(1 for s in specs if s.kind == "call")
        evts += sum(1 for s in specs if s.kind == "evt")
    assert (calls, evts) == (305, 107)


def test_jug_file_overload_suffixes():
    specs = compile_contract("jug", load_abi(os.path.join(REF_CONF, "makermcd", "jug.abi")))
    file_tables = [s.table for s in specs if s.table.startswith("jug_call_file")]
    assert file_tables == ["jug_call_file", "jug_call_file0", "jug_call_file1"]


def test_dispatch_keys_shape():
    specs = compile_contract("dai", load_abi(os.path.join(REF_CONF, "makermcd", "dai.abi")))
    idx = dispatch_index(specs)
    transfer_evt = next(s for s in specs if s.table == "dai_evt_transfer")
    # universally-known ERC-20 Transfer topic0
    assert transfer_evt.signature == "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    transfer_call = next(s for s in specs if s.table == "dai_call_transfer")
    assert transfer_call.signature == "0xa9059cbb" + "0" * 56
    assert idx[transfer_evt.signature] is transfer_evt
    for sig in idx:
        assert sig.startswith("0x") and len(sig) == 66


def test_common_columns_and_param_naming():
    specs = compile_contract("vat", load_abi(os.path.join(REF_CONF, "makermcd", "vat.abi")))
    frob = next(s for s in specs if s.table == "vat_call_frob")
    names = [f.name for f in frob.schema.fields]
    assert names[:6] == [
        "block_number", "block_hash", "address", "log_index", "transaction_index", "transaction_hash",
    ]
    assert names[6:] == ["i", "u", "v", "w", "dink", "dart"]
    assert [str(f.dataType) for f in frob.schema.fields[6:]] == [
        "BinaryType()", "StringType()", "StringType()", "StringType()",
        "DecimalType(38,0)", "DecimalType(38,0)",
    ]


def test_unnamed_params_get_v_columns():
    abi = [
        {
            "type": "function",
            "stateMutability": "nonpayable",
            "name": "poke",
            "inputs": [{"name": "", "type": "uint256"}, {"name": "", "type": "address"}, {"name": "x", "type": "bool"}],
        }
    ]
    (spec,) = compile_contract("c", abi)
    assert spec.param_names == ["v0", "v1", "x"]


def test_view_functions_and_anonymous_events_excluded():
    abi = [
        {"type": "function", "stateMutability": "view", "name": "gem", "inputs": []},
        {"type": "event", "anonymous": True, "name": "LogNote", "inputs": []},
        {"type": "function", "stateMutability": "nonpayable", "name": "kick", "inputs": []},
    ]
    specs = compile_contract("c", abi)
    assert [s.table for s in specs] == ["c_call_kick"]


def test_shared_registry_reproduces_reference_global_leak():
    """The reference's module-global suffix dicts leak across contracts
    (/root/reference/functions.py:82-84); shared_registry=True reproduces
    that for parity, default scoping does not."""
    abi = [
        {"type": "function", "stateMutability": "nonpayable", "name": "file", "inputs": []},
    ]
    c = SchemaCompiler(shared_registry=True)
    (a,) = c.compile_contract("one", abi)
    (b,) = c.compile_contract("two", abi)
    assert a.table == "one_call_file" and b.table == "two_call_file0"

    (a2,) = compile_contract("one", abi)
    (b2,) = compile_contract("two", abi)
    assert a2.table == "one_call_file" and b2.table == "two_call_file"


def test_unsupported_type_is_hard_error():
    abi = [
        {"type": "function", "stateMutability": "nonpayable", "name": "f",
         "inputs": [{"name": "x", "type": "uint128"}]},
    ]
    with pytest.raises(Exception, match="unsupported ABI input type"):
        compile_contract("c", abi)


def test_indexed_dynamic_params_are_binary_columns():
    """An INDEXED dynamic event param (string/bytes/array) is stored on
    chain as its keccak digest; the decoder yields raw bytes32, so the
    compiled column must be BinaryType — the value-type mapping would
    crash the Arrow conversion on decode."""
    from pyspark.sql.types import ArrayType, BinaryType, StringType

    from makerdao_dw_spark.abi.schema import compile_contract

    abi = [
        {
            "type": "event",
            "name": "Labeled",
            "anonymous": False,
            "inputs": [
                {"name": "tag", "type": "string", "indexed": True},
                {"name": "owners", "type": "address[]", "indexed": True},
                {"name": "note", "type": "string", "indexed": False},
            ],
        }
    ]
    (spec,) = compile_contract("demo", abi)
    types = {f.name: f.dataType for f in spec.schema.fields}
    assert isinstance(types["tag"], BinaryType)
    assert isinstance(types["owners"], BinaryType)
    # non-indexed dynamic params keep their value type
    assert isinstance(types["note"], StringType) or isinstance(types["note"], ArrayType)
