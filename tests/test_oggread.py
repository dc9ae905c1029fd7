"""Ogg container audit unit tests (core/oggread.py)."""

from pdf_spark.core.oggread import encode_ogg_page, ogg_audit


def test_single_stream_walk_and_codec():
    f = (
        encode_ogg_page(7, 0, b"\x01vorbis" + b"h" * 20, bos=True)
        + encode_ogg_page(7, 1, b"x" * 300)  # multi-byte lacing (255+45)
        + encode_ogg_page(7, 2, b"tail", eos=True)
    )
    a = ogg_audit(f)
    assert a == {
        "is_ogg": 1, "n_pages": 3, "n_streams": 1, "has_eos": 1,
        "codec": "vorbis", "truncated": 0,
    }


def test_multiplexed_streams_first_bos_codec():
    f = (
        encode_ogg_page(1, 0, b"OpusHead\x01", bos=True)
        + encode_ogg_page(2, 0, b"\x80theora", bos=True)
        + encode_ogg_page(1, 1, b"", eos=True)
    )
    a = ogg_audit(f)
    assert a["n_streams"] == 2 and a["codec"] == "opus"
    assert a["n_pages"] == 3


def test_truncation_and_garbage():
    good = encode_ogg_page(9, 0, b"\x01vorbis", bos=True)
    a = ogg_audit(good + encode_ogg_page(9, 1, b"y" * 64)[:-5])
    assert a["truncated"] == 1 and a["n_pages"] == 1
    # bad version byte
    bad = bytearray(good)
    bad[4] = 1
    assert ogg_audit(bytes(bad))["truncated"] == 1
    assert ogg_audit(b"ID3 not ogg" + b"\x00" * 20)["is_ogg"] == 0
    assert ogg_audit(b"OggS")["is_ogg"] == 0  # shorter than a header


def test_zero_length_payload_page():
    f = encode_ogg_page(3, 0, b"", bos=True, eos=True)
    a = ogg_audit(f)
    assert a["n_pages"] == 1 and a["has_eos"] == 1 and a["truncated"] == 0
