"""Embedded-image pixel decode (core/pdfimages.py).

Covers the codec matrix (Flate gray, DCTDecode JPEG, Indexed palettes,
sub-byte bpc, CMYK, ImageMask with /Decode), filter-prefix chains ahead
of DCTDecode, the cross-codec decoded-digest invariant qx39 rests on,
form-nested reachability, and the error-row contract.
"""

import hashlib

from pdf_spark.core.document import Resolver
from pdf_spark.core.imaging import encode_jpeg
from pdf_spark.core.pdfimages import extract_embedded_images
from pdf_spark.gen.pdfgen import F_HELV, PdfBuilder, _content_td_tj


def _doc_with_images(specs, xobject_extra=b""):
    """One-page PDF whose /XObject carries each (data, extra_dict,
    filters) spec as /Im{k}."""
    b = PdfBuilder()
    cat = b.reserve()
    pages = b.reserve()
    page = b.reserve()
    font = b.add(F_HELV)
    cont = b.stream(_content_td_tj(["x"]), filters="FlateDecode")
    ids = [b.stream(data, extra_dict=extra, filters=filt)
           for data, extra, filt in specs]
    xo = b"".join(b"/Im%d %d 0 R" % (k, o) for k, o in enumerate(ids)) \
        + xobject_extra
    b.set(cat, b"<</Type/Catalog/Pages %d 0 R>>" % pages)
    b.set(pages, b"<</Type/Pages/Kids[%d 0 R]/Count 1>>" % page)
    b.set(page, b"<</Type/Page/Parent %d 0 R/MediaBox[0 0 612 792]"
                b"/Resources<</Font<</F1 %d 0 R>>/XObject<<%s>>>>"
                b"/Contents %d 0 R>>" % (pages, font, xo, cont))
    return b.build(cat), b


def test_codec_matrix_exact_values():
    specs = [
        # Flate gray constant 77, 9x5
        (bytes([77]) * 45,
         b"/Subtype/Image/Width 9/Height 5/BitsPerComponent 8"
         b"/ColorSpace/DeviceGray", "FlateDecode"),
        # baseline JPEG dc=100 (integer-exact fixture)
        (encode_jpeg(16, 16, [(100, 0)] * 4),
         b"/Subtype/Image/Width 16/Height 16/BitsPerComponent 8"
         b"/ColorSpace/DeviceGray/Filter/DCTDecode", ""),
        # Indexed 1-bpc into DeviceRGB, every pixel index 1 = (80,FF,20)
        (bytes([0xFF]) * 4,
         b"/Subtype/Image/Width 8/Height 4/BitsPerComponent 1"
         b"/ColorSpace[/Indexed/DeviceRGB 1 <00000080FF20>]", "FlateDecode"),
        # 4-bpc gray, width 3 => rows pad to 2 bytes; nibbles F,8,0
        (bytes([0xF8, 0x00, 0xF8, 0x00]),
         b"/Subtype/Image/Width 3/Height 2/BitsPerComponent 4"
         b"/ColorSpace/DeviceGray", ""),
        # CMYK 8-bpc: white (0,0,0,0) then black (full ink)
        (bytes([0, 0, 0, 0, 255, 255, 255, 255]),
         b"/Subtype/Image/Width 2/Height 1/BitsPerComponent 8"
         b"/ColorSpace/DeviceCMYK", ""),
        # ImageMask, /Decode [1 0] inversion: bits 101 -> 0,255,0
        (bytes([0b10100000]),
         b"/Subtype/Image/Width 3/Height 1/ImageMask true/Decode[1 0]", ""),
    ]
    raw, _ = _doc_with_images(specs)
    rows = extract_embedded_images(Resolver(raw))
    got = {r[1]: r for r in rows}
    assert got["Im0"][2:6] == (9, 5, 1, 77)
    assert got["Im1"][2:6] == (16, 16, 1, 100)
    # palette gray-ish entry (0x80,0xFF,0x20): ITU-601 luma floor = 191
    assert got["Im2"][2:6] == (8, 4, 3, 191)
    # nibble scale: 255,136,0 per row -> floor mean 130
    assert got["Im3"][2:6] == (3, 2, 1, 130)
    assert got["Im4"][2:6] == (2, 1, 3, 127)
    assert got["Im5"][2:6] == (3, 1, 1, 85)
    assert all(r[8] is None for r in rows)


def test_cross_codec_pixel_digest_equal():
    """The qx39 invariant: same pixels via Flate and via (integer-exact)
    baseline JPEG produce the same decoded-sample md5."""
    v = 137
    specs = [
        (bytes([v]) * 256,
         b"/Subtype/Image/Width 16/Height 16/BitsPerComponent 8"
         b"/ColorSpace/DeviceGray", "FlateDecode"),
        (encode_jpeg(16, 16, [(v, 0)] * 4),
         b"/Subtype/Image/Width 16/Height 16/BitsPerComponent 8"
         b"/ColorSpace/DeviceGray/Filter/DCTDecode", ""),
    ]
    raw, _ = _doc_with_images(specs)
    rows = extract_embedded_images(Resolver(raw))
    assert rows[0][7] == rows[1][7] == hashlib.md5(bytes([v]) * 256).hexdigest()


def test_filter_prefix_chain_before_dct():
    """[/ASCIIHexDecode /DCTDecode]: the transport prefix runs through
    the standard chain, the JPEG tail through the imaging decoder."""
    jpeg = encode_jpeg(16, 16, [(64, 0)] * 4)
    specs = [
        (jpeg.hex().encode() + b">",
         b"/Subtype/Image/Width 16/Height 16/BitsPerComponent 8"
         b"/ColorSpace/DeviceGray/Filter[/ASCIIHexDecode/DCTDecode]", ""),
    ]
    raw, _ = _doc_with_images(specs)
    rows = extract_embedded_images(Resolver(raw))
    assert rows[0][2:6] == (16, 16, 1, 64)
    assert rows[0][8] is None


def test_form_nested_and_ref_dedup():
    """An image reachable only through a form XObject is decoded once;
    the same ref mounted twice dedups by (obj, gen) identity."""
    b = PdfBuilder()
    cat = b.reserve()
    pages = b.reserve()
    page = b.reserve()
    font = b.add(F_HELV)
    cont = b.stream(_content_td_tj(["x"]), filters="FlateDecode")
    inner = b.stream(
        bytes([10]) * 16,
        extra_dict=b"/Subtype/Image/Width 4/Height 4/BitsPerComponent 8"
                   b"/ColorSpace/DeviceGray",
        filters="FlateDecode",
    )
    form = b.stream(
        b"",
        extra_dict=b"/Subtype/Form/BBox[0 0 1 1]/Resources<</XObject<<"
                   b"/In %d 0 R>>>>" % inner,
    )
    xo = b"/Fm0 %d 0 R/Dup %d 0 R" % (form, inner)
    b.set(cat, b"<</Type/Catalog/Pages %d 0 R>>" % pages)
    b.set(pages, b"<</Type/Pages/Kids[%d 0 R]/Count 1>>" % page)
    b.set(page, b"<</Type/Page/Parent %d 0 R/MediaBox[0 0 612 792]"
                b"/Resources<</Font<</F1 %d 0 R>>/XObject<<%s>>>>"
                b"/Contents %d 0 R>>" % (pages, font, xo, cont))
    rows = extract_embedded_images(Resolver(b.build(cat)))
    assert len(rows) == 1 and rows[0][5] == 10


def test_error_rows_never_fatal():
    specs = [
        # unsupported colorspace -> error row with geometry
        (b"\x00",
         b"/Subtype/Image/Width 4/Height 4/BitsPerComponent 8"
         b"/ColorSpace/Pattern", ""),
        # short sample data
        (bytes(3),
         b"/Subtype/Image/Width 4/Height 4/BitsPerComponent 8"
         b"/ColorSpace/DeviceGray", ""),
        # decompression bomb by declared dims
        (b"\x00",
         b"/Subtype/Image/Width 100000/Height 100000/BitsPerComponent 8"
         b"/ColorSpace/DeviceGray", ""),
        # good row after the bad ones still decodes
        (bytes([5]) * 4,
         b"/Subtype/Image/Width 2/Height 2/BitsPerComponent 8"
         b"/ColorSpace/DeviceGray", ""),
    ]
    raw, _ = _doc_with_images(specs)
    rows = extract_embedded_images(Resolver(raw))
    errs = {r[1]: r[8] for r in rows}
    assert errs["Im0"] and "colorspace" in errs["Im0"]
    assert errs["Im1"] and "short" in errs["Im1"]
    assert errs["Im2"] and ("dims" in errs["Im2"] or "large" in errs["Im2"])
    assert errs["Im3"] is None
    got = {r[1]: r for r in rows}
    assert got["Im0"][2:4] == (4, 4)  # geometry survives the error
    assert got["Im3"][5] == 5


def test_icc_based_channel_count():
    """[/ICCBased stream] takes its component count from /N."""
    b = PdfBuilder()
    cat = b.reserve()
    pages = b.reserve()
    page = b.reserve()
    font = b.add(F_HELV)
    cont = b.stream(_content_td_tj(["x"]), filters="FlateDecode")
    prof = b.stream(b"\x00" * 8, extra_dict=b"/N 3")
    img = b.stream(
        bytes([10, 20, 30] * 4),
        extra_dict=b"/Subtype/Image/Width 2/Height 2/BitsPerComponent 8"
                   b"/ColorSpace[/ICCBased %d 0 R]" % prof,
        filters="FlateDecode",
    )
    b.set(cat, b"<</Type/Catalog/Pages %d 0 R>>" % pages)
    b.set(pages, b"<</Type/Pages/Kids[%d 0 R]/Count 1>>" % page)
    b.set(page, b"<</Type/Page/Parent %d 0 R/MediaBox[0 0 612 792]"
                b"/Resources<</Font<</F1 %d 0 R>>/XObject<</I %d 0 R>>>>"
                b"/Contents %d 0 R>>" % (pages, font, img, cont))
    rows = extract_embedded_images(Resolver(b.build(cat)))
    # luma of (10,20,30) = (2990+11740+3420)//1000 = 18
    assert rows[0][2:6] == (2, 2, 3, 18)
    assert rows[0][8] is None


# --- inline images (§8.9.7) ------------------------------------------------------


def test_inline_image_abbreviations_and_filters():
    import binascii

    from pdf_spark.core.pdfimages import parse_inline_image
    from pdf_spark.core.objects import Name

    # AHx filter + /G colorspace, abbreviated keys throughout
    data = binascii.hexlify(bytes([200] * 16)) + b">"
    content = b" /W 4/H 4/BPC 8/CS/G/F/AHx ID " + data + b"\nEI rest"
    stream, end = parse_inline_image(content, 0)
    assert stream.dict["Width"] == 4
    assert str(stream.dict["Filter"]) == "ASCIIHexDecode"
    assert str(stream.dict["ColorSpace"]) == "DeviceGray"
    assert content[end:] == b" rest"
    assert stream.decoded(None) == bytes([200] * 16)
    # Indexed /I array translates its base too
    c2 = b" /W 2/H 1/BPC 8/CS[/I/RGB 1 <000000ffffff>] ID \x00\x01\nEI"
    s2, _ = parse_inline_image(c2, 0)
    cs = s2.dict["ColorSpace"]
    assert str(cs[0]) == "Indexed" and str(cs[1]) == "DeviceRGB"


def test_inline_image_enumeration_is_token_safe():
    from pdf_spark.core.pdfimages import iter_inline_images

    # a '(BI)' string literal and an embedded 'EI' byte pair must not
    # fake or truncate images; two real images both enumerate
    content = (
        b"BT (fake BI here) Tj ET\n"
        b"BI /W 2/H 2/BPC 8/CS/G ID " + bytes([1, 2, 3, 4]) + b"\nEI\n"
        b"q 1 0 0 1 5 5 cm Q\n"
        b"BI /W 1/H 1/BPC 8/CS/G ID " + b"xEIx"[:1] + b"\nEI\n"
    )
    imgs = list(iter_inline_images(content))
    assert len(imgs) == 2
    # raw keeps the pre-EI whitespace byte by design: the unfiltered
    # decode path reads exactly rows*h bytes, ASCII filters ignore it
    assert imgs[0].raw == bytes([1, 2, 3, 4]) + b"\n"
    assert imgs[0].dict["Width"] == 2


def test_inline_image_extract_through_document():
    from pdf_spark.core.document import Resolver
    from pdf_spark.core.pdfimages import extract_inline_images
    from pdf_spark.gen.pdfgen import _GOOD_VARIANTS, generate_doc

    idx = [i for i, (n, _) in enumerate(_GOOD_VARIANTS)
           if n == "inline_image"][0]
    pdf, _exp, name, _err = generate_doc("line one\nline two\nline three", idx)
    assert name == "inline_image"
    rows = extract_inline_images(Resolver(pdf))
    # the fixture's 8x8 gray ramp (0..63): mean 31, known aHash shape
    assert len(rows) == 1
    pg, i, w, h, ch, luma, ahash, md5, err = rows[0]
    assert (w, h, ch, luma, err) == (8, 8, 1, 31, None)
    assert ahash == "00000000ffffffff"
