"""Standard security handler: RC4-40/128, AES-128 (V4/AESV2) and
AES-256 (V5/R6/AESV3) with the EMPTY user password.

EXTENSION beyond the reference (no encryption support anywhere in
/root/reference — an encrypted doc panics in the object parser): a large
slice of real web PDFs is encrypted with an empty user password (viewer
opens silently, strings/streams are RC4/AES-wrapped). Everything here is
public spec: PDF 32000-1 §7.6 (algorithms 1-6) and ISO 32000-2 §7.6.4
(algorithm 2.B / R6), RC4 (public stream cipher), AES per FIPS-197.

The AES tables are COMPUTED from the GF(2^8) definition (exp/log tables +
the affine transform) rather than embedded, so the implementation is
self-evidently spec-derived. Pure Python is fast enough here: encrypted
payloads are a corpus minority and documents are small; the hot path
(parse/interp) is untouched.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

from pdf_spark.core.errors import ENCRYPTED, PdfError

# -- RC4 ----------------------------------------------------------------------


def _py_rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# native RC4 when available (same import-gate policy as AES below; the
# pure-Python `_py_rc4` stays as fallback and test oracle)
try:  # pragma: no cover - availability depends on the host
    from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4 as _ARC4
    from cryptography.hazmat.primitives.ciphers import Cipher as _RC4Cipher

    def rc4(key: bytes, data: bytes) -> bytes:
        try:
            ctx = _RC4Cipher(_ARC4(key), mode=None).encryptor()
        except ValueError:  # key size outside ARC4's supported set
            return _py_rc4(key, data)
        return ctx.update(data) + ctx.finalize()

except ImportError:  # pragma: no cover
    rc4 = _py_rc4


# -- AES (FIPS-197), tables computed from the field definition ----------------

_EXP = [0] * 512
_LOG = [0] * 256


def _init_gf() -> None:
    x = 1
    for i in range(255):
        _EXP[i] = x
        _LOG[x] = i
        # multiply by the generator 0x03: x*2 (reduced by 0x11B) XOR x
        x2 = x << 1
        if x2 & 0x100:
            x2 ^= 0x11B
        x ^= x2
    for i in range(255, 512):
        _EXP[i] = _EXP[i - 255]


_init_gf()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _build_sbox() -> tuple[bytes, bytes]:
    sbox = bytearray(256)
    for c in range(256):
        inv = 0 if c == 0 else _EXP[255 - _LOG[c]]
        s, r = inv, inv
        for _ in range(4):
            r = ((r << 1) | (r >> 7)) & 0xFF
            s ^= r
        sbox[c] = s ^ 0x63
    inv_sbox = bytearray(256)
    for c in range(256):
        inv_sbox[sbox[c]] = c
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [1]
while len(_RCON) < 14:
    r = _RCON[-1] << 1
    _RCON.append(r ^ 0x11B if r & 0x100 else r)


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    # group into 4x4 round-key matrices (column-major state)
    return [sum(words[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[0])]
    nr = len(rk) - 1
    for rnd in range(1, nr):
        s = [_SBOX[s[i]] for i in _SHIFT]
        m = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            m[4 * c] = _gmul(a0, 2) ^ _gmul(a1, 3) ^ a2 ^ a3
            m[4 * c + 1] = a0 ^ _gmul(a1, 2) ^ _gmul(a2, 3) ^ a3
            m[4 * c + 2] = a0 ^ a1 ^ _gmul(a2, 2) ^ _gmul(a3, 3)
            m[4 * c + 3] = _gmul(a0, 3) ^ a1 ^ a2 ^ _gmul(a3, 2)
        s = [m[i] ^ rk[rnd][i] for i in range(16)]
    s = [_SBOX[s[i]] for i in _SHIFT]
    return bytes(b ^ k for b, k in zip(s, rk[nr]))


def _decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[nr])]
    for rnd in range(nr - 1, 0, -1):
        s = [_INV_SBOX[s[i]] for i in _INV_SHIFT]
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        m = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            m[4 * c] = _gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13) ^ _gmul(a3, 9)
            m[4 * c + 1] = _gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11) ^ _gmul(a3, 13)
            m[4 * c + 2] = _gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14) ^ _gmul(a3, 11)
            m[4 * c + 3] = _gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9) ^ _gmul(a3, 14)
        s = m
    s = [_INV_SBOX[s[i]] for i in _INV_SHIFT]
    return bytes(b ^ k for b, k in zip(s, rk[0]))


def _py_aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(rk, block)
        out += prev
    return bytes(out)


def _py_aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, block), prev))
        prev = block
    return bytes(out)


# native AES when the `cryptography` package is present (import-gated; the
# pure-Python path above is the always-available fallback and the oracle the
# tests cross-check the native path against)
try:  # pragma: no cover - availability depends on the host
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _Cipher,
        algorithms as _algorithms,
        modes as _modes,
    )

    def _native_cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
        c = _Cipher(_algorithms.AES(key), _modes.CBC(iv))
        ctx = c.encryptor() if encrypt else c.decryptor()
        return ctx.update(data) + ctx.finalize()

except ImportError:  # pragma: no cover
    _native_cbc = None


def _cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    if _native_cbc is not None:
        return _native_cbc(key, iv, data, encrypt)
    if encrypt:
        return _py_aes_cbc_encrypt(key, iv, data)
    return _py_aes_cbc_decrypt(key, iv, data)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded CBC data must be block-aligned")
    return _cbc(key, iv, data, encrypt=True)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    if len(data) % 16:
        raise PdfError(ENCRYPTED, "AES data not block-aligned")
    out = bytearray(_cbc(key, iv, data, encrypt=False))
    if unpad and out:
        n = out[-1]
        if 1 <= n <= 16:
            del out[-n:]
    return bytes(out)


# -- standard security handler (PDF 32000-1 §7.6; ISO 32000-2 §7.6.4) ---------

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_file_key_rc4(
    password: bytes, o: bytes, p: int, id0: bytes,
    key_len: int, revision: int, encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the RC4/AES-128 file encryption key."""
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if revision >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def compute_o_value(owner_pw: bytes, user_pw: bytes, key_len: int, revision: int) -> bytes:
    """Algorithm 3: the /O entry (generator side)."""
    key = hashlib.md5(_pad_password(owner_pw)).digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_len]
    o = rc4(key, _pad_password(user_pw))
    if revision >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u_value(file_key: bytes, id0: bytes, revision: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U entry."""
    if revision == 2:
        return rc4(file_key, PAD)
    x = hashlib.md5(PAD + id0).digest()
    u = rc4(file_key, x)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16


def object_key(file_key: bytes, obj_id: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object RC4/AES-128 key."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", obj_id)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


_HASH_2B_MEMO: dict[bytes, bytes] = {}


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the R6 password hash.

    Memoized (bounded): 2.B is an intentionally slow KDF, and both the
    generator and the verifier evaluate it on the same (password, salt)
    pairs repeatedly within one process."""
    memo_key = hashlib.sha256(
        len(password).to_bytes(2, "big") + password + salt + udata
    ).digest()
    cached = _HASH_2B_MEMO.get(memo_key)
    if cached is not None:
        return cached
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            if len(_HASH_2B_MEMO) < 64:
                _HASH_2B_MEMO[memo_key] = k[:32]
            return k[:32]


class Decryptor:
    """Verified empty-user-password decryptor for one document."""

    __slots__ = ("file_key", "aes", "v5")

    def __init__(self, file_key: bytes, aes: bool, v5: bool) -> None:
        self.file_key = file_key
        self.aes = aes
        self.v5 = v5

    def decrypt(self, data: bytes, obj_id: int, gen: int) -> bytes:
        if self.v5:
            # AES-256: the file key is used directly (no per-object rekey)
            if len(data) < 16:
                raise PdfError(ENCRYPTED, "AES payload shorter than its IV")
            return aes_cbc_decrypt(self.file_key, data[:16], data[16:])
        key = object_key(self.file_key, obj_id, gen, self.aes)
        if self.aes:
            if len(data) < 16:
                raise PdfError(ENCRYPTED, "AES payload shorter than its IV")
            return aes_cbc_decrypt(key, data[:16], data[16:])
        return rc4(key, data)

    def encrypt(self, data: bytes, obj_id: int, gen: int, iv: bytes) -> bytes:
        """Inverse of :meth:`decrypt` (generator/tests). ``iv`` must be 16
        deterministic bytes for AES modes; ignored for RC4."""
        if self.v5:
            return iv + aes_cbc_encrypt(self.file_key, iv, data)
        key = object_key(self.file_key, obj_id, gen, self.aes)
        if self.aes:
            return iv + aes_cbc_encrypt(key, iv, data)
        return rc4(key, data)


_R6_KEY_CACHE: dict[bytes, bytes] = {}
_STD_KEY_CACHE: dict[bytes, bytes] = {}


def _get_bytes(d: dict, key: str, resolver) -> bytes:
    v = resolver.resolve(d.get(key)) if resolver is not None else d.get(key)
    if not isinstance(v, bytes):
        raise PdfError(ENCRYPTED, f"/Encrypt missing string /{key}")
    return v


def build_decryptor(enc: dict, id0: bytes, resolver=None) -> Decryptor:
    """Verify the EMPTY user password against /Encrypt and return the
    working decryptor; wrong/unsupported setups raise ENCRYPTED (an error
    row, never a task failure)."""
    rz = (lambda v: resolver.resolve(v)) if resolver is not None else (lambda v: v)
    filt = rz(enc.get("Filter"))
    if str(filt) != "Standard":
        raise PdfError(ENCRYPTED, f"security handler {filt!r}")
    v = rz(enc.get("V")) or 0
    r = rz(enc.get("R")) or 0
    o = _get_bytes(enc, "O", resolver)
    u = _get_bytes(enc, "U", resolver)
    p = rz(enc.get("P"))
    if not isinstance(p, int):
        raise PdfError(ENCRYPTED, "/Encrypt missing /P")

    if v == 5:
        if r != 6:
            raise PdfError(ENCRYPTED, f"V5 with unsupported R{r}")
        if len(u) < 48:
            raise PdfError(ENCRYPTED, "/U shorter than 48 bytes")
        ue = _get_bytes(enc, "UE", resolver)
        # Algorithm 2.B is an intentionally slow KDF (64+ AES/SHA rounds);
        # memoize the verified file key per (U, UE) so a corpus that repeats
        # an encryption setup pays the derivation once per executor
        memo_key = hashlib.md5(u[:48] + ue[:32]).digest()
        cached = _R6_KEY_CACHE.get(memo_key)
        if cached is not None:
            return Decryptor(cached, aes=True, v5=True)
        vs, ks = u[32:40], u[40:48]
        if hash_2b(b"", vs) != u[:32]:
            raise PdfError(ENCRYPTED, "empty user password rejected (R6)")
        itk = hash_2b(b"", ks)
        file_key = aes_cbc_decrypt(itk, b"\x00" * 16, ue[:32], unpad=False)
        if len(_R6_KEY_CACHE) < 256:
            _R6_KEY_CACHE[memo_key] = file_key
        return Decryptor(file_key, aes=True, v5=True)

    if v in (1, 2, 4):
        key_len = 5
        length = rz(enc.get("Length"))
        if isinstance(length, int) and length >= 40:
            key_len = length // 8
        aes = False
        if v == 4:
            cf = rz(enc.get("CF")) or {}
            stmf = str(rz(enc.get("StmF")) or "Identity")
            cfd = rz(cf.get(stmf)) if isinstance(cf, dict) else None
            cfm = str(rz(cfd.get("CFM"))) if isinstance(cfd, dict) else ""
            if cfm == "AESV2":
                aes = True
                key_len = 16
            elif cfm not in ("V2",):
                raise PdfError(ENCRYPTED, f"crypt filter {cfm!r}")
        em = rz(enc.get("EncryptMetadata"))
        em = True if em is None else bool(em)
        # memoize the verified key per encryption setup: derivation is
        # 50 MD5s + a 20-round RC4 U-check (~0.3 ms) and real corpora
        # repeat setups across a site's documents
        memo_key = hashlib.md5(
            o[:32] + u[:32] + id0 + struct.pack("<iBBBB", p, r, v, key_len, em)
        ).digest()
        cached = _STD_KEY_CACHE.get(memo_key)
        if cached is not None:
            return Decryptor(cached, aes=aes, v5=False)
        file_key = compute_file_key_rc4(b"", o, p, id0, key_len, r, em)
        expect = compute_u_value(file_key, id0, r)
        n = 32 if r == 2 else 16
        if expect[:n] != u[:n]:
            raise PdfError(ENCRYPTED, "empty user password rejected")
        if len(_STD_KEY_CACHE) < 256:
            _STD_KEY_CACHE[memo_key] = file_key
        return Decryptor(file_key, aes=aes, v5=False)

    raise PdfError(ENCRYPTED, f"encryption V{v} unsupported")
