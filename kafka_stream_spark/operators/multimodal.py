"""Multimodal column plumbing (north-star M6).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. ``decode_image`` ships REAL dependency-free decoders for PPM
(P6/P3) and uncompressed 24/32-bit BMP — true pixel decoding runs
end-to-end through ``extract_features(fake_decode=False)`` (pytest:
tests/test_sources.py). Formats needing a codec library (PNG/JPEG/…)
raise ``NotImplementedError`` until one is installed; ``fake=True``
keeps the deterministic pseudo-decode the synthetic-corpus oracle uses.
Everything Spark-side is real and tested:

- the schema convention (``content BINARY, media STRUCT<kind, ...>``),
- Arrow-batched ``mapInPandas`` feature extraction (real and fake paths),
- partition-count preservation (no shuffle through the UDF).

For the oracle-checked query, binary payloads are synthesized
deterministically from ``documents.text`` (UTF-8 bytes) so DuckDB can
verify the byte-level features the Pandas stage emits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_stream_spark.operators._common import load
from kafka_stream_spark.registry import query

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
    ]
)


def _decode_ppm(content: bytes) -> dict:
    """Netpbm PPM decoder (P6 binary / P3 ASCII; 1- and 2-byte samples
    per the maxval rule) — the format spec is public
    (netpbm.sourceforge.net/doc/ppm.html). ``mean_lum`` is the mean of
    the RAW sample values at the file's own depth."""
    magic = content[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            nl = content.find(b"\n", pos)
            pos = nl + 1 if nl != -1 else len(content)
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    width, height, maxval = fields
    if not 0 < maxval < 65536:
        raise ValueError(f"PPM maxval {maxval} out of spec range")
    if width <= 0 or height <= 0:
        raise ValueError("PPM with zero dimension")
    wide = maxval > 255  # spec: maxval 256-65535 → 2-byte big-endian samples
    n = width * height * 3
    if magic == b"P6":
        pos += 1  # exactly one whitespace byte after maxval
        nbytes = n * (2 if wide else 1)
        pix = content[pos : pos + nbytes]
        if len(pix) != nbytes:
            raise ValueError("truncated PPM pixel data")
        if wide:
            import struct as _struct

            total = sum(_struct.unpack(f">{n}H", pix))
        else:
            total = sum(pix)
    else:  # P3: ASCII sample values
        vals = content[pos:].split()
        if len(vals) < n:
            raise ValueError("truncated PPM pixel data")
        total = sum(int(v) for v in vals[:n])
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "mean_lum": round(total / n, 6),
    }


def _decode_bmp(content: bytes) -> dict:
    """Windows BMP decoder (BITMAPINFOHEADER): uncompressed 1/4/8-bit
    palette (packed MSB-first), 16-bit XRGB1555, 24/32-bit truecolor,
    and RLE8/RLE4-compressed palette images including delta escapes —
    wire layout is the public Windows BMP file-format spec. Remaining
    typed seams: 2-bit (Windows CE only), BI_BITFIELDS custom channel
    masks, and OS/2 BITMAPCOREHEADER (a library drops into the same
    dispatch)."""
    import struct as _struct

    if len(content) < 54:
        raise ValueError("truncated BMP header")
    data_off = _struct.unpack_from("<I", content, 10)[0]
    hdr_size = _struct.unpack_from("<I", content, 14)[0]
    width, height = _struct.unpack_from("<ii", content, 18)
    bpp = _struct.unpack_from("<H", content, 28)[0]
    compression = _struct.unpack_from("<I", content, 30)[0]
    clr_used = _struct.unpack_from("<I", content, 46)[0]
    supported = (
        (compression == 0 and bpp in (1, 4, 8, 16, 24, 32))
        or (compression == 1 and bpp == 8)
        or (compression == 2 and bpp == 4)
    )
    if not supported:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    height = abs(height)  # negative height = top-down rows; stats invariant
    if width <= 0 or height == 0:
        raise ValueError("BMP with zero or negative dimension")
    n = width * height * 3
    if bpp in (1, 4, 8):
        # palette: BGRA quads right after the info header; entry's
        # luminance contribution is b+g+r
        n_entries = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        pal = content[pal_off : pal_off + 4 * n_entries]
        if len(pal) != 4 * n_entries:
            raise ValueError("truncated BMP palette")
        lut = [pal[i] + pal[i + 1] + pal[i + 2] for i in range(0, len(pal), 4)]
        if compression == 1:
            return _decode_bmp_rle(content, data_off, width, height, lut, 8)
        if compression == 2:
            return _decode_bmp_rle(content, data_off, width, height, lut, 4)
        # packed rows, MSB-first within each byte (the BMP bit order);
        # stride pads to 4-byte boundaries in BITS
        stride = ((width * bpp + 31) // 32) * 4
        row_bytes = (width * bpp + 7) // 8
        total = 0
        for row in range(height):
            base = data_off + row * stride
            line = content[base : base + row_bytes]
            if len(line) != row_bytes:
                raise ValueError("truncated BMP pixel data")
            try:
                if bpp == 8:
                    total += sum(lut[v] for v in line)
                elif bpp == 4:
                    for x in range(width):
                        byte = line[x >> 1]
                        total += lut[(byte >> 4) if x % 2 == 0 else (byte & 0x0F)]
                else:  # 1-bit
                    for x in range(width):
                        total += lut[(line[x >> 3] >> (7 - (x & 7))) & 1]
            except IndexError:
                raise ValueError("BMP palette index out of range") from None
        return {"width": width, "height": height, "channels": 3,
                "mean_lum": round(total / n, 6)}
    if bpp == 16:
        # BI_RGB 16bpp is XRGB1555; 5-bit channels expand to 8 bits by
        # (v<<3)|(v>>2), the standard bit-replication rule
        stride = (width * 2 + 3) & ~3
        exp = [(v << 3) | (v >> 2) for v in range(32)]
        total = 0
        for row in range(height):
            base = data_off + row * stride
            line = content[base : base + width * 2]
            if len(line) != width * 2:
                raise ValueError("truncated BMP pixel data")
            for x in range(width):
                u = line[2 * x] | (line[2 * x + 1] << 8)
                total += exp[(u >> 10) & 31] + exp[(u >> 5) & 31] + exp[u & 31]
        return {"width": width, "height": height, "channels": 3,
                "mean_lum": round(total / n, 6)}
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3  # rows pad to 4-byte boundaries
    total = 0
    for row in range(height):
        base = data_off + row * stride
        line = content[base : base + width * bytes_pp]
        if len(line) != width * bytes_pp:
            raise ValueError("truncated BMP pixel data")
        if bytes_pp == 3:
            total += sum(line)
        else:  # BGRA: drop the alpha byte from the luminance sum
            total += sum(line) - sum(line[3::4])
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "mean_lum": round(total / n, 6),
    }


def _decode_bmp_rle(content: bytes, pos: int, width: int, height: int,
                    lut: list[int], bits: int) -> dict:
    """BI_RLE8 / BI_RLE4 (BMP spec): encoded runs ``[count, value]``
    (RLE4 alternates the value byte's two nibbles), escapes ``00 00``
    end-of-line, ``00 01`` end-of-bitmap, ``00 02 dx dy`` delta, and
    ``00 03+`` absolute runs (packed nibbles for RLE4; both
    word-padded). Pixels a short line, an early EOB, or a delta skip
    leaves unwritten default to palette index 0, matching common
    decoder behavior."""
    total = 0
    rows_done = x = 0
    try:
        while rows_done < height:
            count, val = content[pos], content[pos + 1]
            pos += 2
            if count:  # encoded run
                run = min(count, width - x)
                if bits == 8:
                    total += lut[val] * run
                else:  # RLE4: high nibble first, alternating
                    hi, lo = lut[val >> 4], lut[val & 0x0F]
                    total += hi * ((run + 1) // 2) + lo * (run // 2)
                x += run
            elif val == 0:  # end of line: unwritten pixels = index 0
                total += lut[0] * (width - x)
                rows_done += 1
                x = 0
            elif val == 1:  # end of bitmap
                total += lut[0] * (width - x)
                rows_done += 1
                total += lut[0] * width * (height - rows_done)
                rows_done = height
            elif val == 2:  # delta: cursor moves right dx, up dy rows;
                # the skipped pixels are undefined by the spec — they
                # decode as index 0, like every other unwritten pixel
                dx, dy = content[pos], content[pos + 1]
                pos += 2
                if x + dx > width or rows_done + dy >= height:
                    raise ValueError("BMP RLE delta out of bounds")
                total += lut[0] * (dy * width + dx)
                rows_done += dy
                x += dx
            else:  # absolute run of `val` raw pixels, word-padded
                run = min(val, width - x)
                nbytes = val if bits == 8 else (val + 1) // 2
                chunk = content[pos : pos + nbytes]
                if len(chunk) != nbytes:
                    raise ValueError("truncated BMP RLE data")
                if bits == 8:
                    total += sum(lut[v] for v in chunk[:run])
                else:
                    for i in range(run):
                        byte = chunk[i >> 1]
                        total += lut[(byte >> 4) if i % 2 == 0 else (byte & 0x0F)]
                x += run
                pos += nbytes + (nbytes & 1)
    except IndexError:
        raise ValueError("truncated BMP RLE data") from None
    return {"width": width, "height": height, "channels": 3,
            "mean_lum": round(total / (width * height * 3), 6)}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


#: Adam7 pass grid: (x0, y0, dx, dy) per pass (RFC 2083 §2.6)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter_image(raw: bytes, offset: int, width: int, height: int,
                        spp: int, color_spp: int,
                        sample_bytes: int = 1) -> tuple[int, int]:
    """Unfilter one (sub-)image of ``height`` scanlines starting at
    ``offset``; returns (color-sample sum, next offset). PNG filters
    operate on BYTES with the left-neighbor at ``bpp = spp·depth/8``
    bytes back (RFC 2083 §6.2), so 16-bit images reuse the same filter
    code with a wider stride; samples recombine big-endian afterwards."""
    bpp = spp * sample_bytes
    stride = width * bpp
    has_alpha = color_spp != spp
    prev = bytearray(stride)
    total = 0
    for _ in range(height):
        if offset + 1 + stride > len(raw):
            raise ValueError("PNG pixel data length mismatch")
        ftype = raw[offset]
        line = bytearray(raw[offset + 1 : offset + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype}")
        if sample_bytes == 2:
            for px in range(width):
                base = px * bpp
                for s in range(color_spp):
                    total += (line[base + 2 * s] << 8) | line[base + 2 * s + 1]
        elif has_alpha:
            for px in range(width):
                total += sum(line[px * bpp : px * bpp + color_spp])
        else:
            total += sum(line)
        prev = line
        offset += 1 + stride
    return total, offset


def _png_unfilter_packed(raw: bytes, offset: int, width: int, height: int,
                         depth: int, lut: list[int]) -> tuple[int, int]:
    """Unfilter one (sub-)image whose samples are bit-PACKED (depth
    1/2/4, or 8 for palette indices; one sample per pixel), summing
    ``lut[sample]`` per pixel. Filters still operate on whole bytes
    with bpp=1 (RFC 2083 §6.2: filter distance is one byte when a
    pixel is under a byte); row-end padding bits are ignored."""
    stride = (width * depth + 7) // 8
    prev = bytearray(stride)
    total = 0
    mask = (1 << depth) - 1
    per_byte = 8 // depth
    for _ in range(height):
        if offset + 1 + stride > len(raw):
            raise ValueError("PNG pixel data length mismatch")
        ftype = raw[offset]
        line = bytearray(raw[offset + 1 : offset + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(1, stride):
                line[i] = (line[i] + line[i - 1]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - 1] if i else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - 1] if i else 0
                ul = prev[i - 1] if i else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype}")
        count = 0
        for byte in line:
            for k in range(per_byte):
                if count >= width:
                    break
                total += lut[(byte >> (8 - depth * (k + 1))) & mask]
                count += 1
        prev = line
        offset += 1 + stride
    return total, offset


#: legal (color type, bit depth) combinations — PNG spec §11.2.2
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _decode_png(content: bytes) -> dict:
    """PNG decoder (RFC 2083) on nothing but stdlib zlib: every legal
    (color type, bit depth) pair — greyscale (0) at 1/2/4/8/16, RGB (2)
    at 8/16, palette (3) at 1/2/4/8, grey+alpha (4) and RGBA (6) at
    8/16 — all five scanline filters (None/Sub/Up/Average/Paeth), IDAT
    split across any number of chunks, and Adam7 interlacing (each pass
    is its own filtered sub-image; the passes partition the pixels, so
    summing per pass gives exact whole-image stats). mean_lum averages
    the color samples AT THE FILE'S OWN DEPTH (the PPM convention),
    alpha excluded; palette images resolve indices to their 8-bit RGB
    entries (the GIF convention, channels = 3); otherwise ``channels``
    reports samples per pixel as stored (so RGBA = 4)."""
    import struct as _struct
    import zlib as _zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos, width, plte = 8, None, None
    idat = bytearray()
    while pos + 8 <= len(content):
        clen, ctype = _struct.unpack_from(">I4s", content, pos)
        body = content[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                _struct.unpack(">IIBBBBB", body)
            if color not in _PNG_DEPTHS:
                raise ValueError(f"PNG color type {color}")
            if depth not in _PNG_DEPTHS[color]:
                raise ValueError(
                    f"PNG bit depth {depth} illegal for color type {color}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"PNG interlace method {interlace}")
            if width == 0 or height == 0:
                raise ValueError("PNG with zero dimension")
            spp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
        elif ctype == b"PLTE":
            if clen % 3 or clen == 0:
                raise ValueError("PNG PLTE length not a multiple of 3")
            # per-index luminance contribution: r+g+b of the entry
            plte = [body[i] + body[i + 1] + body[i + 2]
                    for i in range(0, clen, 3)]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = _zlib.decompress(bytes(idat))
    if color == 3 or depth < 8:
        # bit-packed single-sample pixels: palette indices or low-depth
        # greyscale; per-pixel values map through a LUT
        if color == 3:
            if plte is None:
                raise ValueError("PNG palette image missing PLTE")
            lut, basis, channels = plte, 3, 3  # resolve to RGB, like GIF
        else:
            lut, basis, channels = list(range(1 << depth)), 1, 1
        total, off = 0, 0
        try:
            if interlace:
                for (x0, y0, dx, dy) in _ADAM7:
                    pw = (width - x0 + dx - 1) // dx
                    ph = (height - y0 + dy - 1) // dy
                    if pw <= 0 or ph <= 0:
                        continue
                    t, off = _png_unfilter_packed(raw, off, pw, ph, depth, lut)
                    total += t
            else:
                total, off = _png_unfilter_packed(raw, off, width, height,
                                                  depth, lut)
        except IndexError:
            raise ValueError("PNG palette index out of range") from None
        if off != len(raw):
            raise ValueError("PNG pixel data length mismatch")
        n = width * height * basis
        return {
            "width": width,
            "height": height,
            "channels": channels,
            "mean_lum": round(total / n, 6),
        }
    color_spp = spp - (1 if spp in (2, 4) else 0)
    sample_bytes = depth // 8
    total, off = 0, 0
    if interlace:
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:  # empty pass at small dimensions
                continue
            t, off = _png_unfilter_image(raw, off, pw, ph, spp, color_spp,
                                         sample_bytes)
            total += t
    else:
        total, off = _png_unfilter_image(raw, off, width, height, spp,
                                         color_spp, sample_bytes)
    if off != len(raw):
        raise ValueError("PNG pixel data length mismatch")
    n = width * height * color_spp
    return {
        "width": width,
        "height": height,
        "channels": spp,
        "mean_lum": round(total / n, 6),
    }


def encode_png(pixels: list[list[tuple]], color_type: int = 2,
               depth: int = 8, palette: list[tuple] | None = None) -> bytes:
    """Minimal PNG writer (filter 0 rows, one IDAT) so tests and demo
    corpora can synthesize REAL files for the decoder without an
    imaging library. ``pixels`` is rows of per-pixel sample tuples at
    the target ``depth`` (16-bit samples land big-endian; depths under
    8 bit-pack MSB-first). Palette images (color_type=3) take index
    tuples plus the ``palette`` of RGB triples."""
    import struct as _struct
    import zlib as _zlib

    if depth not in _PNG_DEPTHS.get(color_type, ()):
        raise ValueError(f"PNG depth {depth} for color type {color_type}")
    spp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    height, width = len(pixels), len(pixels[0])

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (_struct.pack(">I", len(body)) + ctype + body
                + _struct.pack(">I", _zlib.crc32(ctype + body)))

    ihdr = _struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    raw = bytearray()
    for row in pixels:
        raw.append(0)  # filter: None
        if depth < 8:
            acc = nbits = 0
            for px in row:
                acc = (acc << depth) | (px[0] & ((1 << depth) - 1))
                nbits += depth
                if nbits == 8:
                    raw.append(acc)
                    acc = nbits = 0
            if nbits:
                raw.append(acc << (8 - nbits))  # row-end pad bits
        elif depth == 8:
            for px in row:
                raw += bytes(px[:spp])
        else:
            for px in row:
                for s in px[:spp]:
                    raw += _struct.pack(">H", s)
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette required for color type 3")
        out += chunk(b"PLTE", b"".join(bytes(c[:3]) for c in palette))
    return (out + chunk(b"IDAT", _zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW (GIF89a spec, Appendix F): variable code width
    starting at min_code_size+1, CLEAR resets the table, EOI ends the
    stream, widths grow after the table fills through 12 bits."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width, next_code
        table = [[i] for i in range(1 << min_code_size)] + [[], []]
        width = min_code_size + 1
        next_code = eoi + 1

    width = next_code = 0
    reset()
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            if next_code == (1 << width) and width < 12:
                width += 1
            prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """The matching encoder (for tests/synthesis): greedy longest-match,
    emits CLEAR up front and EOI at the end, grows width with the
    table, re-CLEARs at 12 bits."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset():
        nonlocal table, width, next_code
        table = {(i,): i for i in range(1 << min_code_size)}
        width = min_code_size + 1
        next_code = eoi + 1

    table: dict[tuple, int] = {}
    width = next_code = 0
    reset()
    emit(clear)
    buf: tuple = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12):
            emit(clear)
            reset()
        buf = (sym,)
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _decode_gif(content: bytes) -> dict:
    """GIF87a/89a decoder (the public GIF spec + Appendix F LZW):
    global/local color tables, extension-block skipping, sub-block
    de-blocking, first image frame only (animation frames after the
    first are counted, not decoded). Interlaced rows don't change
    luminance stats, so the row order is left as stored."""
    import struct as _struct

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    sw, sh, flags, _bg, _ar = _struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = content[pos : pos + 3 * n]
        pos += 3 * n
    first: dict | None = None
    n_frames = 0
    while pos < len(content):
        b = content[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while content[pos]:
                pos += 1 + content[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _x, _y, w, h, iflags = _struct.unpack_from("<HHHHB", content, pos + 1)
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = content[pos : pos + 3 * n]
            pos += 3 * n
        min_code = content[pos]
        pos += 1
        data = bytearray()
        while content[pos]:
            ln = content[pos]
            data += content[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        n_frames += 1
        if first is None:
            if w == 0 or h == 0:
                raise ValueError("GIF frame with zero dimension")
            if ct is None:
                raise ValueError("GIF image has no color table")
            idx = _lzw_decode(bytes(data), min_code)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            total = sum(
                ct[3 * i] + ct[3 * i + 1] + ct[3 * i + 2]
                for i in idx[: w * h]
            )
            first = {
                "width": w,
                "height": h,
                "channels": 3,
                "mean_lum": round(total / (w * h * 3), 6),
            }
    if first is None:
        raise ValueError("GIF contains no image data")
    return first


def encode_gif(rgb_rows: list[list[tuple]]) -> bytes:
    """Minimal GIF89a writer (palette built from the distinct colors,
    ≤256; real LZW) so tests can synthesize true files."""
    import struct as _struct

    height, width = len(rgb_rows), len(rgb_rows[0])
    palette: list[tuple] = sorted({px for row in rgb_rows for px in row})
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors")
    depth = max(1, (len(palette) - 1).bit_length())
    table_n = 1 << depth
    lut = {c: i for i, c in enumerate(palette)}
    indices = [lut[px] for row in rgb_rows for px in row]
    min_code = max(2, depth)
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    for c in palette:
        out += bytes(c)
    out += bytes(3 * (table_n - len(palette)))
    out += b"\x2c" + _struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(min_code)
    lzw = _lzw_encode(indices, min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_image(content: bytes, fake: bool = False) -> dict:
    """Decode an image payload → {width, height, channels, mean_lum}.

    Real, dependency-free decoders ship for PPM (P6/P3), uncompressed
    24/32-bit BMP, and 8-bit non-interlaced PNG (stdlib zlib; all five
    scanline filters) — enough to exercise true pixel decoding
    end-to-end through ``extract_features``. Other formats (JPEG/…)
    need a codec library this container lacks and raise
    ``NotImplementedError`` (a real library drops into this dispatch
    without touching the plan).
    ``fake=True`` derives deterministic pseudo-dimensions from the byte
    length — the mode the synthetic-corpus oracle uses.
    """
    if fake:
        n = len(content)
        return {"width": n % 640 + 1, "height": (n * 7) % 480 + 1}
    if content[:2] in (b"P6", b"P3"):
        return _decode_ppm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:8] == _PNG_SIG:
        return _decode_png(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(content)
    if content[:2] == b"\xff\xd8":
        from kafka_stream_spark.operators.jpeg_codec import decode_jpeg

        return decode_jpeg(content)
    raise NotImplementedError(
        "unsupported image format (PPM/BMP/PNG/GIF/JPEG decode natively; "
        "others need an imaging library — plumbing: "
        "extract_features/mapInPandas)"
    )


REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("mean_lum", DoubleType()),
    ]
)


# MPEG audio frame-header tables (public ISO/IEC 11172-3 layout).
# bitrate kbps by (version_group, layer); version_group 1 = MPEG1,
# 2 = MPEG2/2.5 (which share Layer II/III tables).
_MP3_BITRATE = {
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
# sample rate by version bits (3=MPEG1, 2=MPEG2, 0=MPEG2.5)
_MP3_RATE = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def parse_mp3_headers(content: bytes) -> dict:
    """Header-only MPEG audio (MP3) parse → sample_rate, channels,
    n_frames (decoded sample frames), duration_s; ``rms`` is None —
    sample decoding needs a codec library, and a real one drops into
    ``decode_audio``'s dispatch without touching the plan. Walks the
    frame chain (sync + version/layer/bitrate/padding → frame length),
    skips a leading ID3v2 tag and a trailing ID3v1 block."""
    pos = 0
    if content[:3] == b"ID3" and len(content) >= 10:
        size = 0
        for b in content[6:10]:  # syncsafe 28-bit length
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    frames = 0
    total_samples = 0
    rate = channels = None
    while pos + 4 <= len(content):
        if content[pos:pos + 3] == b"TAG":  # ID3v1 trailer
            break
        h = int.from_bytes(content[pos:pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            if frames:
                break  # trailing junk after a valid chain
            raise ValueError(f"mp3: lost frame sync at byte {pos}")
        ver = (h >> 19) & 3       # 3=MPEG1 2=MPEG2 0=MPEG2.5
        layer = 4 - ((h >> 17) & 3)  # 1..3
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3
        if ver == 1 or layer == 4 or br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("mp3: reserved/free-format header field")
        vgroup = 1 if ver == 3 else 2
        tbl_layer = 2 if (vgroup == 2 and layer == 3) else layer  # MPEG2 LII==LIII
        bitrate = _MP3_BITRATE[(vgroup, tbl_layer)][br_idx - 1] * 1000
        f_rate = _MP3_RATE[ver][sr_idx]
        if layer == 1:
            samples, flen = 384, (12 * bitrate // f_rate + padding) * 4
        elif layer == 2:
            samples, flen = 1152, 144 * bitrate // f_rate + padding
        else:
            samples = 1152 if vgroup == 1 else 576
            flen = samples // 8 * bitrate // f_rate + padding
        if flen <= 4:
            raise ValueError("mp3: degenerate frame length")
        rate = rate or f_rate
        channels = channels or (1 if mode == 3 else 2)
        frames += 1
        total_samples += samples
        pos += flen
    if not frames:
        raise ValueError("mp3: no audio frames")
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": 0,
        "n_frames": total_samples,
        "duration_s": round(total_samples / rate, 6),
        "rms": None,
    }


def decode_audio(content: bytes) -> dict:
    """Decode a RIFF/WAVE PCM payload → sample_rate, channels, bits,
    n_frames, duration_s, rms. Dependency-free: the RIFF container and
    PCM sample layout are the public WAVE format spec. MPEG audio (MP3)
    dispatches to the header-only parser (metadata, rms=None); other
    codecs (AAC/…) need a codec library and raise
    ``NotImplementedError``.
    """
    import struct as _struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        if content[:3] == b"ID3" or (
            len(content) >= 2 and content[0] == 0xFF and content[1] & 0xE0 == 0xE0
        ):
            return parse_mp3_headers(content)
        raise NotImplementedError("not a RIFF/WAVE or MPEG-audio payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = _struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate = _struct.unpack_from("<HHI", fmt, 0)
    bits = _struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        audio_fmt = _struct.unpack_from("<H", fmt, 24)[0]  # SubFormat GUID head
    ok = (audio_fmt == 1 and bits in (8, 16, 24, 32)) or \
        (audio_fmt == 3 and bits == 32)  # 3 = IEEE float
    if not ok:
        raise NotImplementedError(f"WAV format={audio_fmt} bits={bits}")
    if channels == 0 or rate == 0:
        raise ValueError("WAV with zero channels or sample rate")
    bytes_per_frame = channels * bits // 8
    n_frames = len(data) // bytes_per_frame
    n = n_frames * channels
    if audio_fmt == 3:  # float32 in [-1, 1]
        samples = _struct.unpack_from(f"<{n}f", data, 0)
        sq = sum(s * s for s in samples)
        denom = 1.0
    elif bits == 16:
        samples = _struct.unpack_from(f"<{n}h", data, 0)
        sq = sum(s * s for s in samples)
        denom = 32768.0
    elif bits == 32:
        samples = _struct.unpack_from(f"<{n}i", data, 0)
        sq = sum(s * s for s in samples)
        denom = 2147483648.0
    elif bits == 24:  # packed little-endian signed 24-bit
        samples = [
            int.from_bytes(data[i:i + 3], "little", signed=True)
            for i in range(0, n * 3, 3)
        ]
        sq = sum(s * s for s in samples)
        denom = 8388608.0
    else:  # 8-bit PCM is unsigned, centered at 128
        samples = [b - 128 for b in data[: n_frames * bytes_per_frame]]
        sq = sum(s * s for s in samples)
        denom = 128.0
    rms = (sq / max(1, len(samples))) ** 0.5 / denom
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_s": round(n_frames / rate, 6),
        "rms": round(rms, 6),
    }


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Real WAV decoding through the same partition-preserving
    mapInPandas plumbing as image features."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                    "duration_s": [f["duration_s"] for f in feats],
                    "rms": [f["rms"] for f in feats],
                }
            )

    return media.mapInPandas(gen, schema=AUDIO_FEATURE_SCHEMA)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    ``mapInPandas`` keeps the input partitioning — no shuffle.
    ``fake_decode=False`` runs the REAL decoders (PPM/BMP natively; a
    codec library extends ``decode_image`` for other formats) and emits
    true width/height/channels/mean-luminance per payload.
    """

    def gen_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "byte_len": lens,
                    "fake_width": lens % 640 + 1,
                    "fake_height": (lens * 7) % 480 + 1,
                }
            )

    def gen_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "byte_len": pdf["content"].map(len),
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "mean_lum": [f["mean_lum"] for f in feats],
                }
            )

    if fake_decode:
        return media.mapInPandas(gen_fake, schema=FEATURE_SCHEMA)
    return media.mapInPandas(gen_real, schema=REAL_FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Synthesize a binary media table from documents (UTF-8 payloads)."""
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("kind"),
        F.col("text").cast("binary").alias("content"),
    )


# ---------------------------------------------------------------------------
# real video decoding — YUV4MPEG2 (Y4M), the dependency-free container
# ---------------------------------------------------------------------------

_Y4M_CHROMA = {  # colorspace tag → (u_div_w, u_div_h); None = no chroma
    "C420": (2, 2), "C420jpeg": (2, 2), "C420paldv": (2, 2),
    "C420mpeg2": (2, 2), "C422": (2, 1), "C444": (1, 1), "Cmono": None,
}


def decode_video(content: bytes) -> dict:
    """YUV4MPEG2 (Y4M) decoder — the public uncompressed video container
    (mjpegtools spec): ``YUV4MPEG2 W… H… F…:… [I…] [A…] [C…]\\n`` then
    per-frame ``FRAME[params]\\n`` + raw planes. Returns stream metadata
    and per-frame mean luma (the Y plane IS luminance — no colorspace
    math needed). JPEG/H.26x need codec libraries this container lacks;
    they raise NotImplementedError and drop into this dispatch when a
    library exists."""
    if not content.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "unsupported video format (Y4M decodes natively; compressed "
            "codecs need a video library)"
        )
    hdr_end = content.index(b"\n")
    params = content[:hdr_end].decode("ascii").split(" ")[1:]
    width = height = None
    fps_num, fps_den, chroma = 25, 1, "C420"
    for p in params:
        if p.startswith("W"):
            width = int(p[1:])
        elif p.startswith("H"):
            height = int(p[1:])
        elif p.startswith("F"):
            fps_num, fps_den = (int(x) for x in p[1:].split(":"))
        elif p.startswith("C"):
            chroma = p
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    if width <= 0 or height <= 0:
        raise ValueError("Y4M with zero dimension")
    if chroma not in _Y4M_CHROMA:
        raise NotImplementedError(f"Y4M colorspace {chroma}")
    sub = _Y4M_CHROMA[chroma]
    y_size = width * height
    c_size = 0 if sub is None else (width // sub[0]) * (height // sub[1])
    frame_bytes = y_size + 2 * c_size
    pos = hdr_end + 1
    frame_lumas: list[float] = []
    while pos < len(content):
        nl = content.index(b"\n", pos)
        if not content[pos:nl].startswith(b"FRAME"):
            raise ValueError("Y4M: expected FRAME marker")
        plane_start = nl + 1
        y = content[plane_start : plane_start + y_size]
        if len(y) != y_size:
            raise ValueError("truncated Y4M frame")
        frame_lumas.append(round(sum(y) / y_size, 6))
        pos = plane_start + frame_bytes
    return {
        "width": width,
        "height": height,
        "fps": round(fps_num / fps_den, 6),
        "n_frames": len(frame_lumas),
        "frame_lumas": frame_lumas,
    }


def encode_y4m(frames: list[list[list[int]]], fps: tuple[int, int] = (25, 1),
               chroma: str = "C420") -> bytes:
    """Minimal Y4M writer (flat 128 chroma planes) so tests and demo
    corpora can synthesize real video files. ``frames`` is a list of
    2-D luma arrays (rows of 0-255)."""
    height, width = len(frames[0]), len(frames[0][0])
    sub = _Y4M_CHROMA[chroma]
    c_size = 0 if sub is None else (width // sub[0]) * (height // sub[1])
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {chroma}\n"
        .encode("ascii")
    )
    for fr in frames:
        out += b"FRAME\n"
        for row in fr:
            out += bytes(row)
        out += bytes([128]) * (2 * c_size)
    return bytes(out)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def sample_video_frames(media: DataFrame, stride: int = 3) -> DataFrame:
    """REAL frame sampling: decode Y4M payloads and keep every
    ``stride``-th frame's luma statistics — the true-pixel counterpart
    of the byte-window ``sample_frames``. Same partition-preserving
    mapInPandas shape: each task decodes only its own rows, frames
    never materialize JVM-side."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "width": [],
                   "height": [], "mean_luma": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                v = decode_video(bytes(content))
                for i, luma in enumerate(v["frame_lumas"]):
                    if i % stride:
                        continue
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["width"].append(v["width"])
                    out["height"].append(v["height"])
                    out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema=VIDEO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# frame sampling / resize / audio windows — the decode-adjacent ops
# ---------------------------------------------------------------------------
#
# Oracle note: payloads are UTF-8 bytes of the ASCII-only synthetic corpus,
# so DuckDB's VARCHAR substr/md5/ord see EXACTLY the bytes the Pandas stage
# sees — full value-level verification of byte-level plumbing. With real
# media bytes only the Spark side runs (same plan, no oracle).

_FRAME_BYTES = 32
_FRAME_STRIDE = 3  # keep every 3rd frame

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """Fixed-size frame windows over the binary payload, every k-th kept.

    The 1→N row expansion happens inside ``mapInPandas`` (UDTF shape), so
    frames never materialize as a JVM array column; partitioning is
    preserved — no shuffle at any scale.
    """
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                for i in range(0, (len(b) + _FRAME_BYTES - 1) // _FRAME_BYTES):
                    if i % _FRAME_STRIDE:
                        continue
                    chunk = b[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema=FRAME_SCHEMA)


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, i AS frame_idx,
             substr(text, i * {_FRAME_BYTES} + 1, {_FRAME_BYTES}) AS chunk
      FROM documents
      CROSS JOIN (SELECT unnest(generate_series(0, 200)) AS i)
      WHERE i * {_FRAME_BYTES} < octet_length(encode(text))
        AND i % {_FRAME_STRIDE} = 0
    )
    SELECT doc_id, frame_idx,
           octet_length(encode(chunk)) AS frame_len,
           md5(chunk) AS frame_md5
    FROM f
    ORDER BY doc_id, frame_idx
    """,
    description=(
        "Frame sampling over binary media: fixed-size windows, every k-th "
        "kept, 1->N rows inside mapInPandas (no JVM array materialization)"
    ),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return sample_frames(documents_as_media(documents)).orderBy("doc_id", "frame_idx")


_RESIZE_STRIDE = 2

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_len", LongType()),
        StructField("resized_len", LongType()),
        StructField("resized_md5", StringType()),
    ]
)


def resize_media(media: DataFrame) -> DataFrame:
    """Stride-based byte downsampling (the resize stand-in: a real image
    resize drops in here, same batch shape). Vectorized slicing per payload;
    emits the resized signature, not the original blob."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "orig_len": [], "resized_len": [], "resized_md5": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                r = b[::_RESIZE_STRIDE]
                rows["doc_id"].append(doc_id)
                rows["orig_len"].append(len(b))
                rows["resized_len"].append(len(r))
                rows["resized_md5"].append(hashlib.md5(r).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, schema=RESIZE_SCHEMA)


@query(
    "multimodal_resize",
    oracle=f"""
    WITH r AS (
      SELECT doc_id,
             octet_length(encode(text)) AS orig_len,
             array_to_string([substr(text, i, 1)
                              for i in range(1, octet_length(encode(text)) + 1,
                                             {_RESIZE_STRIDE})], '') AS resized
      FROM documents
    )
    SELECT doc_id, orig_len,
           octet_length(encode(resized)) AS resized_len,
           md5(resized) AS resized_md5
    FROM r
    ORDER BY doc_id
    """,
    description=(
        "Media resize stand-in: stride byte-downsample in mapInPandas with "
        "md5 signature of the resized payload"
    ),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return resize_media(documents_as_media(documents)).orderBy("doc_id")


_AUDIO_WINDOW = 64

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        StructField("peak", LongType()),
    ]
)


def audio_window_features(media: DataFrame) -> DataFrame:
    """Windowed sample statistics over the payload interpreted as unsigned
    8-bit PCM — numpy-vectorized inside the Arrow batch (the shape a real
    audio featurizer uses)."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "window_idx": [], "n_samples": [], "energy": [], "peak": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                samples = np.frombuffer(bytes(content), dtype=np.uint8)
                for w in range(0, (len(samples) + _AUDIO_WINDOW - 1) // _AUDIO_WINDOW):
                    win = samples[w * _AUDIO_WINDOW : (w + 1) * _AUDIO_WINDOW]
                    rows["doc_id"].append(doc_id)
                    rows["window_idx"].append(w)
                    rows["n_samples"].append(len(win))
                    rows["energy"].append(int(win.sum()))
                    rows["peak"].append(int(win.max()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, schema=AUDIO_SCHEMA)


@query(
    "multimodal_audio_energy",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, i - 1 AS pos, ord(substr(text, i, 1)) AS sample
      FROM documents
      CROSS JOIN (SELECT unnest(generate_series(1, 8000)) AS i)
      WHERE i <= octet_length(encode(text))
    )
    SELECT doc_id,
           pos // {_AUDIO_WINDOW} AS window_idx,
           count(*) AS n_samples,
           CAST(sum(sample) AS BIGINT) AS energy,
           max(sample) AS peak
    FROM s
    GROUP BY doc_id, window_idx
    ORDER BY doc_id, window_idx
    """,
    description=(
        "Audio-style windowed energy/peak over binary payloads as u8 "
        "samples — numpy-vectorized mapInPandas feature extraction"
    ),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return audio_window_features(documents_as_media(documents)).orderBy(
        "doc_id", "window_idx"
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id, 'image/fake' AS kind,
           octet_length(encode(text)) AS byte_len,
           octet_length(encode(text)) % 640 + 1 AS fake_width,
           (octet_length(encode(text)) * 7) % 480 + 1 AS fake_height
    FROM documents
    ORDER BY doc_id
    """,
    description="Binary media column + mapInPandas feature extraction (stubbed decoder)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    media = documents_as_media(documents)
    return extract_features(media, fake_decode=True).orderBy("doc_id")


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicates (dHash + banded Hamming LSH)
# ---------------------------------------------------------------------------
#
# The image-dedup shape: resize every payload to a fixed R x (C+1) sample
# grid (stride-scaled byte sampling — the 1-D stand-in for bilinear
# resize), take the difference hash (bit = left sample < right sample,
# R*C bits), then find near-duplicate pairs by banded LSH over the hash:
# split into B bands, candidate pairs share at least one exact band,
# verified by full Hamming distance. A real decoder swaps the byte
# sampler for pixel luma without touching the hash/band/join plumbing.

_PH_ROWS = 6
_PH_COLS = 8  # bits per row; samples per row = _PH_COLS + 1
_PH_BITS = _PH_ROWS * _PH_COLS  # 48
_PH_SAMPLES = _PH_ROWS * (_PH_COLS + 1)  # 54
_PH_BANDS = 4
_PH_BAND_BITS = _PH_BITS // _PH_BANDS  # 12
_PH_MAXDIST = 12  # 25% of bits; the synthetic corpus has no true image dupes


def _ph_spark_hash() -> str:
    """48-bit dHash of the payload string as a Spark SQL expression."""
    samples = ", ".join(
        f"ascii(substr(text, 1 + ({k} * n) div {_PH_SAMPLES}, 1))"
        for k in range(_PH_SAMPLES)
    )
    return f"""
      aggregate(
        sequence(0, {_PH_BITS - 1}),
        cast(0 as bigint),
        (acc, i) -> acc + IF(
          element_at(smp, cast((i div {_PH_COLS}) * {_PH_COLS + 1}
                               + i % {_PH_COLS} + 1 as int))
            < element_at(smp, cast((i div {_PH_COLS}) * {_PH_COLS + 1}
                                   + i % {_PH_COLS} + 2 as int)),
          shiftleft(cast(1 as bigint), i), cast(0 as bigint)))
    """, f"array({samples})"


@query(
    "multimodal_phash_neardup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    ),
    bits AS (
      SELECT doc_id, k.i AS i,
             CASE WHEN
               ascii(substr(text,
                 1 + (((k.i // {_PH_COLS}) * {_PH_COLS + 1} + k.i % {_PH_COLS}) * n)
                     // {_PH_SAMPLES}, 1))
               < ascii(substr(text,
                 1 + (((k.i // {_PH_COLS}) * {_PH_COLS + 1} + k.i % {_PH_COLS} + 1) * n)
                     // {_PH_SAMPLES}, 1))
             THEN 1::BIGINT << k.i ELSE 0 END AS b
      FROM d CROSS JOIN (SELECT unnest(generate_series(0, {_PH_BITS - 1})) AS i) k
    ),
    ph AS (SELECT doc_id, sum(b)::BIGINT AS h FROM bits GROUP BY doc_id),
    bands AS (
      SELECT doc_id, h, j.j AS band,
             (h >> ({_PH_BAND_BITS} * j.j)) & {(1 << _PH_BAND_BITS) - 1} AS bv
      FROM ph CROSS JOIN (SELECT unnest(generate_series(0, {_PH_BANDS - 1})) AS j) j
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.h AS ha, b.h AS hb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(ha, hb)) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= {_PH_MAXDIST}
    ORDER BY doc_a, doc_b
    """,
    description=(
        "Perceptual-hash near-duplicate pairs: 48-bit dHash over "
        "stride-resampled payload bytes, banded LSH candidates (4x12 "
        "bits), Hamming-verified <= 12"
    ),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Hamming LSH over perceptual hashes. Hash build is one
    codegen'd projection per doc (no UDF — the 'decode' is byte
    sampling here); the band explode multiplies the corpus by B=4 tiny
    rows; candidates come from an equi-join on (band, value) — the only
    shuffle, keyed on 12-bit band values; verification is bit_count on
    the two 64-bit hashes carried through the join. At 12 bits of
    tolerance over 4 bands recall is probabilistic (>=1 clean band
    needed) — that's the LSH trade the banded variant makes vs the
    quadratic exact pass, same as embedding_lsh_banded.
    """
    (documents,) = load(spark, sf_dir, "documents")
    hash_expr, samples_expr = _ph_spark_hash()
    d = documents.select(
        "doc_id", "text", F.expr("octet_length(cast(text as binary))").alias("n")
    )
    ph = d.select(
        "doc_id", F.expr(samples_expr).alias("smp")
    ).select("doc_id", F.expr(hash_expr).alias("h"))
    bands = ph.select(
        "doc_id",
        "h",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_PH_BANDS - 1}), "
                f"j -> struct(j AS band, shiftright(h, {_PH_BAND_BITS} * j) "
                f"& {(1 << _PH_BAND_BITS) - 1} AS bv))"
            )
        ).alias("s"),
    ).select("doc_id", "h", "s.band", "s.bv")
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("h").alias("ha"), "band", "bv"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"), "band", "bv"
    )
    cand = (
        a.join(b, ["band", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    return (
        cand.select(
            "doc_a", "doc_b", F.expr("bit_count(ha ^ hb)").alias("hamming")
        )
        .where(F.col("hamming") <= _PH_MAXDIST)
        .orderBy("doc_a", "doc_b")
    )


_ACT_THRESH = 100  # mean u8 sample >= 100 -> "active" (letters-heavy) window


@query(
    "multimodal_activity_segments",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, i - 1 AS pos, ord(substr(text, i, 1)) AS sample
      FROM documents
      CROSS JOIN (SELECT unnest(generate_series(1, 8000)) AS i)
      WHERE i <= octet_length(encode(text))
    ),
    w AS (
      SELECT doc_id, pos // {_AUDIO_WINDOW} AS window_idx,
             count(*) AS n, sum(sample) AS energy
      FROM s GROUP BY 1, 2
    ),
    flags AS (
      SELECT doc_id, window_idx,
             CASE WHEN energy >= {_ACT_THRESH} * n THEN 1 ELSE 0 END AS active
      FROM w
    ),
    runs AS (
      SELECT doc_id, window_idx, active,
             CASE WHEN active = lag(active) OVER
                    (PARTITION BY doc_id ORDER BY window_idx)
                  THEN 0 ELSE 1 END AS edge
      FROM flags
    ),
    grp AS (
      SELECT doc_id, window_idx, active,
             sum(edge) OVER (PARTITION BY doc_id ORDER BY window_idx) AS seg
      FROM runs
    )
    SELECT doc_id, CAST(seg AS INTEGER) AS segment,
           CAST(active AS INTEGER) AS active,
           CAST(min(window_idx) AS INTEGER) AS start_window,
           CAST(max(window_idx) AS INTEGER) AS end_window,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM grp GROUP BY doc_id, seg, active
    ORDER BY doc_id, segment
    """,
    description=(
        "Activity segmentation (VAD shape): threshold windowed energy, "
        "then gaps-and-islands (lag + running-sum edges) merges runs "
        "into segments — all inside one per-doc window partitioning"
    ),
)
def multimodal_activity_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The voice-activity-detection output shape over the u8 payload:
    per document, maximal runs of active/silent windows. Integer
    threshold compare (energy >= T*n — no division), then the classic
    islands trick: an edge flag via lag(), a running sum to number
    segments, one groupBy to collapse runs. Everything after the
    windowed features shares ONE doc_id partitioning — lag, running
    sum, and segment aggregation cause no extra exchange; segmentation
    cost is linear in windows regardless of corpus size."""
    from pyspark.sql import Window as W

    (documents,) = load(spark, sf_dir, "documents")
    w = audio_window_features(documents_as_media(documents))
    flags = w.select(
        "doc_id",
        "window_idx",
        F.when(F.col("energy") >= _ACT_THRESH * F.col("n_samples"), 1)
        .otherwise(0)
        .alias("active"),
    )
    byd = W.partitionBy("doc_id").orderBy("window_idx")
    runs = flags.withColumn(
        "edge",
        F.when(F.col("active") == F.lag("active").over(byd), 0).otherwise(1),
    )
    grp = runs.withColumn(
        "seg", F.sum("edge").over(byd.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return (
        grp.groupBy("doc_id", "seg", "active")
        .agg(
            F.min("window_idx").alias("start_window"),
            F.max("window_idx").alias("end_window"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            F.col("seg").cast("int").alias("segment"),
            F.col("active").cast("int").alias("active"),
            F.col("start_window").cast("int").alias("start_window"),
            F.col("end_window").cast("int").alias("end_window"),
            F.col("n_windows").cast("bigint").alias("n_windows"),
        )
        .orderBy("doc_id", "segment")
    )
