"""WASM structural audit unit tests (core/wasm.py)."""

from pdf_spark.core.wasm import _leb128_u32, encode_wasm, wasm_audit


def test_full_module_inventory():
    m = encode_wasm(
        [
            (1, b"\x01\x60\x00\x00"),
            (3, b"\x01\x00"),
            (0, b"\x04name" + b"x" * 200),  # 2-byte LEB section size
            (10, b"\x01\x02\x00\x0b"),
            (7, b"\x00"),
        ]
    )
    a = wasm_audit(m)
    assert a["is_wasm"] == 1 and a["version"] == 1
    assert a["n_sections"] == 5 and a["n_custom"] == 1
    assert a["has_code"] == 1 and a["has_export"] == 1
    assert a["truncated"] == 0


def test_truncation_and_garbage_flags():
    good = encode_wasm([(10, b"\x01\x02\x00\x0b")])
    a = wasm_audit(good[:-2])  # size runs past end
    assert a["truncated"] == 1 and a["n_sections"] == 0
    a = wasm_audit(b"\0asm\x01\x00\x00\x00\x63")  # id 0x63 > 12
    assert a["truncated"] == 1
    assert wasm_audit(b"PK\x03\x04 zip not wasm")["is_wasm"] == 0
    assert wasm_audit(b"\0as")["is_wasm"] == 0  # shorter than header


def test_empty_module_and_version():
    a = wasm_audit(encode_wasm([], version=2))
    assert a["is_wasm"] == 1 and a["version"] == 2
    assert a["n_sections"] == 0 and a["truncated"] == 0


def test_leb128_multibyte_and_overlong():
    data = bytes([0xE5, 0x8E, 0x26])  # 624485, spec example
    assert _leb128_u32(data, 0) == (624485, 3)
    assert _leb128_u32(bytes([0x80] * 6), 0)[0] is None  # overlong
    assert _leb128_u32(bytes([0x80]), 0)[0] is None  # truncated
