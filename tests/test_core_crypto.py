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


class TestEncryptedObjStm:
    """Objects INSIDE a /Type/ObjStm of an ENCRYPTED document must be
    EXEMPT from the per-object decrypt (the container stream was already
    decrypted; §7.5.7: strings in compressed objects are not separately
    encrypted). The xref stream itself is never encrypted (§7.5.8.2) and
    parses before the decryptor exists."""

    def _build(self) -> bytes:
        import hashlib
        import zlib

        from pdf_spark.gen.pdfgen import (
            F_HELV,
            _content_td_tj,
            _emit_xref_stream,
            _enc_setup,
        )

        id0, enc_dict, dec = _enc_setup("aes128")
        content = _content_td_tj(["objstm under encryption"])
        # ids: 1 cat, 2 pages, 3 page (w/ string), 4 font — inside ObjStm 5;
        # 6 content (encrypted, type-1); 7 xref stream; 8 /Encrypt dict
        bodies = [
            (1, b"<</Type/Catalog/Pages 2 0 R>>"),
            (2, b"<</Type/Pages/Kids[3 0 R]/Count 1>>"),
            (
                3,
                b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
                b"/Note (plaintext inside objstm)"
                b"/Resources<</Font<</F1 4 0 R>>>>/Contents 6 0 R>>",
            ),
            (4, F_HELV),
        ]
        payload = bytearray()
        pair_parts = []
        for oid, body in bodies:
            pair_parts.append(f"{oid} {len(payload)}")
            payload += body + b"\n"
        header = (" ".join(pair_parts) + "\n").encode()
        stm_plain = zlib.compress(header + bytes(payload))
        stm_enc = dec.encrypt(stm_plain, 5, 0, hashlib.md5(b"s5").digest())
        cont_enc = dec.encrypt(
            zlib.compress(content), 6, 0, hashlib.md5(b"s6").digest()
        )
        out = bytearray(b"%PDF-1.7\n%\xb5\xb6\n\n")
        offsets = {}

        def emit(oid: int, body: bytes) -> None:
            offsets[oid] = len(out)
            out.extend(str(oid).encode() + b" 0 obj\n" + body + b"\nendobj\n\n")

        emit(
            5,
            b"<</Type/ObjStm/N 4/First " + str(len(header)).encode()
            + b"/Filter/FlateDecode/Length " + str(len(stm_enc)).encode()
            + b">>\nstream\n" + stm_enc + b"\nendstream",
        )
        emit(
            6,
            b"<</Length " + str(len(cont_enc)).encode()
            + b"/Filter/FlateDecode>>\nstream\n" + cont_enc + b"\nendstream",
        )
        emit(8, enc_dict)
        rows = [
            (0, 0, 65535),
            (2, 5, 0),
            (2, 5, 1),
            (2, 5, 2),
            (2, 5, 3),
            (1, offsets[5], 0),
            (1, offsets[6], 0),
            (1, len(out), 0),  # xref stream itself (id 7)
            (1, offsets[8], 0),
        ]
        _emit_xref_stream(
            out, 7, rows, 1, predictor=False,
            extra=(
                b"/Encrypt 8 0 R/ID[<" + id0.hex().encode() + b"> <"
                + id0.hex().encode() + b">]/Index[0 9]"
            ),
            size=9,
        )
        return bytes(out)

    def test_text_extracts_and_objstm_strings_not_redecrypted(self):
        from pdf_spark.core.document import Resolver
        from pdf_spark.core.extract import assemble_text, extract_document

        pdf = self._build()
        r = extract_document(pdf)
        assert r.ok, r.error_code
        assert assemble_text(r.spans) == "objstm under encryption"
        # the string INSIDE the ObjStm must come back verbatim — a
        # double-decrypt would garble it
        res = Resolver(pdf)
        page = next(iter(res.iter_pages()))
        assert res.resolve(page.get("Note")) == b"plaintext inside objstm"
