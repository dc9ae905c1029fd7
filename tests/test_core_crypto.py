"""Encryption: standard security handler (PDF 32000-1 §7.6 + ISO 32000-2
§7.6.4 R6) — EXTENSION; the reference has no encryption support at all."""

import pytest

from pdf_spark.core.crypto import (
    _encrypt_block,
    _expand_key,
    _py_aes_cbc_decrypt,
    _py_aes_cbc_encrypt,
    _py_rc4,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    hash_2b,
    object_key,
    rc4,
)
from pdf_spark.core.extract import extract_text
from pdf_spark.gen.pdfgen import _encrypted_doc, wrap_lines


class TestPrimitives:
    def test_aes_fips197_vectors(self):
        # FIPS-197 Appendix C (public spec vectors), all three key sizes
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        cases = [
            ("000102030405060708090a0b0c0d0e0f",
             "69c4e0d86a7b0430d8cdb78070b4c55a"),
            ("000102030405060708090a0b0c0d0e0f1011121314151617",
             "dda97ca4864cdfe06eaf70a0ec0d7191"),
            ("000102030405060708090a0b0c0d0e0f"
             "101112131415161718191a1b1c1d1e1f",
             "8ea2b7ca516745bfeafc49904b496089"),
        ]
        for key_hex, ct_hex in cases:
            rk = _expand_key(bytes.fromhex(key_hex))
            assert _encrypt_block(rk, pt).hex() == ct_hex

    def test_cbc_native_matches_pure_python(self):
        import random

        rng = random.Random(197)
        for klen in (16, 32):
            key = bytes(rng.randrange(256) for _ in range(klen))
            iv = bytes(rng.randrange(256) for _ in range(16))
            data = bytes(rng.randrange(256) for _ in range(160))
            enc = aes_cbc_encrypt(key, iv, data, pad=False)
            assert enc == _py_aes_cbc_encrypt(key, iv, data)
            assert aes_cbc_decrypt(key, iv, enc, unpad=False) == data
            assert _py_aes_cbc_decrypt(key, iv, enc) == data

    def test_cbc_padding_roundtrip(self):
        key = bytes(range(16))
        iv = bytes(range(16, 32))
        for n in (0, 1, 15, 16, 17, 100):
            data = bytes(range(256))[:n]
            assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, data)) == data

    def test_rc4_vector_and_parity(self):
        import random

        # classic public RC4 vector
        assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
        assert _py_rc4(b"Key", b"Plaintext") == rc4(b"Key", b"Plaintext")
        rng = random.Random(4)
        for klen in (5, 10, 16):
            key = bytes(rng.randrange(256) for _ in range(klen))
            data = bytes(rng.randrange(256) for _ in range(333))
            assert rc4(key, data) == _py_rc4(key, data)
            assert rc4(key, rc4(key, data)) == data  # symmetric

    def test_hash_2b_deterministic(self):
        a = hash_2b(b"", b"saltsalt")
        assert len(a) == 32 and a == hash_2b(b"", b"saltsalt")
        assert a != hash_2b(b"x", b"saltsalt")
        assert a != hash_2b(b"", b"other883")

    def test_object_key_shape(self):
        k = object_key(b"0123456789abcdef", 7, 0, aes=True)
        assert len(k) == 16
        assert k != object_key(b"0123456789abcdef", 8, 0, aes=True)
        assert len(object_key(b"01234", 7, 0, aes=False)) == 10


class TestEncryptedDocs:
    PAYLOAD = "Encrypted corpus payload, quick brown fox! " * 5

    @pytest.mark.parametrize("mode", ["rc4_40", "rc4_128", "aes128", "aes256"])
    def test_empty_password_roundtrip(self, mode):
        lines = wrap_lines(self.PAYLOAD)
        pdf = _encrypted_doc(lines, mode)
        text, status, code, n_pages, _ = extract_text(pdf)
        assert status == "ok", code
        assert text == "\n".join(lines)
        # the payload bytes must NOT appear in the raw file (it is really
        # encrypted, not just wrapped)
        assert lines[0].encode() not in pdf
        import zlib

        assert zlib.compress(b"\n".join(l.encode() for l in lines)) not in pdf

    def test_wrong_password_is_error_row(self):
        pdf = _encrypted_doc(wrap_lines(self.PAYLOAD), "badpw")
        text, status, code, _, _ = extract_text(pdf)
        assert (status, code) == ("error", "ENCRYPTED")

    def test_unsupported_scheme_is_error_row(self):
        pdf = _encrypted_doc(wrap_lines(self.PAYLOAD), "aes128")
        # V6 does not exist: flip the V entry
        broken = pdf.replace(b"/V 4", b"/V 9")
        _, status, code, _, _ = extract_text(broken)
        assert (status, code) == ("error", "ENCRYPTED")

    def test_variant_matrix_entries(self):
        from pdf_spark.gen.pdfgen import (
            _BAD_VARIANTS,
            _GOOD_VARIANTS,
            N_VARIANTS,
            generate_doc,
        )

        names = [n for n, _ in _GOOD_VARIANTS]
        for vn in ("encrypted_rc4", "encrypted_aes", "encrypted_aes256"):
            pdf, expected, name, err = generate_doc(self.PAYLOAD, names.index(vn))
            assert name == vn and err == ""
            text, status, code, _, _ = extract_text(pdf)
            assert status == "ok" and text == expected, (vn, code)
        bad_names = [n for n, _, _ in _BAD_VARIANTS]
        k = bad_names.index("encrypted_badpw")
        pdf, _, name, err = generate_doc(self.PAYLOAD, N_VARIANTS + k)
        assert err == "ENCRYPTED"
        _, status, code, _, _ = extract_text(pdf)
        assert (status, code) == ("error", "ENCRYPTED")
