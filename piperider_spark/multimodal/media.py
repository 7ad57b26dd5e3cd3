"""Multimodal column operators over opaque ``binary`` payloads.

Schema convention (the training-data-pipeline shape the north rule asks
for): a media table carries ``(id, media binary, media_type string,
meta struct<width:int, height:int, sample_rate:int, n_frames:int>)`` —
payload opaque, metadata typed.

The Spark-side plumbing — schema handling, partition-sized batch iteration
through ``mapInPandas``, UDF signatures, output shapes — is real and
tested. Real codecs implemented here with stdlib+numpy only: **PNG**
(zlib inflate + all five scanline filters, every color type / bit depth,
Adam7), **GIF** (variable-width LZW both directions, interlace,
transparency), **BMP** (24/32-bit uncompressed), **WAV** (PCM-16) and
**AVI** (RIFF container, uncompressed DIB frames) — genuinely
end-to-end over formats external tools produce and play.
JPEG/mp3/compressed-video remain documented
NotImplementedError seams (entropy decoders need PIL/cv2/av, absent in
this container); a deterministic fake codec covers their pipeline shape.
A real deployment swaps ``_CODECS['image']`` for a PIL/turbojpeg call —
nothing else changes.

Design notes for 100 TB of media:
  * decode/feature-extract goes through ``mapInPandas`` (not a scalar UDF):
    one Arrow batch of payload bytes in, an iterator of result frames out —
    memory stays bounded by batch size, not partition size;
  * payloads should live in their own parquet column chunk; projecting
    metadata only (``meta.*``) never touches the bytes (columnar pruning);
  * resize/frame-sample emit binary back, so chains of media ops stay
    inside one python worker stage (Catalyst fuses adjacent mapInPandas).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_type", StringType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

_FAKE_MAGIC = b"FIMG"


def fake_encode_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload: magic + dims + md5-seeded pixel
    bytes. Stands in for a JPEG so the full pipeline is testable."""
    rng = np.random.default_rng(
        int.from_bytes(hashlib.md5(f"img:{seed}".encode()).digest()[:8], "big")
    )
    pixels = rng.integers(0, 256, size=width * height * 3, dtype=np.uint8)
    return _FAKE_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def _decode_fake_image(payload: bytes) -> np.ndarray:
    if payload[:4] != _FAKE_MAGIC:
        raise ValueError("not a fake image payload")
    w, h = struct.unpack("<II", payload[4:12])
    return np.frombuffer(payload[12:], dtype=np.uint8).reshape(h, w, 3)


def _decode_real_image(payload: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "JPEG decoding requires PIL/cv2 (not in this container); "
        "use codec='png' or codec='bmp' (both real, stdlib), codec='fake', "
        "or register a codec"
    )


# ---- REAL codec: BMP (24/32-bit uncompressed) — pure numpy, no external
# libs, so the media pipeline has a genuinely end-to-end decodable format
# in this container alongside the JPEG/PNG seams.


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a bottom-up 24-bit BMP
    (rows padded to 4 bytes — the standard layout)."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = img[::-1, :, ::-1]  # bottom-up rows, RGB→BGR
    body[:, : w * 3] = bgr.reshape(h, w * 3)
    pixel_data = body.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 14 + 40)
    return header + dib + pixel_data


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to (h, w, 3) uint8 RGB.
    Handles bottom-up and top-down (negative height) layouts and 4-byte
    row padding; rejects compressed/paletted variants explicitly."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_raw)
    ch = bpp // 8
    row_bytes = (w * ch + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * row_bytes, offset=data_offset)
    rows = raw.reshape(h, row_bytes)[:, : w * ch].reshape(h, w, ch)
    if h_raw > 0:  # bottom-up
        rows = rows[::-1]
    return rows[:, :, 2::-1].copy()  # BGR(A)→RGB


# ---- REAL codec: PNG — stdlib ``zlib`` for the deflate stream plus numpy
# reconstruction of the five scanline filter types. Covers every PNG color
# type (gray / RGB / paletted / gray+alpha / RGBA), bit depths 1/2/4/8/16
# (16-bit downscales to the high byte), and both interlace methods (none +
# Adam7 seven-pass). Encoder and decoder are independently written and pin
# each other in roundtrip tests; JPEG remains the one documented
# NotImplementedError image seam (entropy decoding needs a real library).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# Adam7 pass grid: (x0, y0, dx, dy) per pass, in stream order.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_scanlines(raw: np.ndarray, bpp: int, filter_type: int | str) -> bytes:
    """Forward-filter a (h, stride) uint8 raster into the PNG scanline
    stream (1 filter-type byte + filtered bytes per row).

    ``bpp`` is the byte distance to the pixel on the left (``max(1,
    channels * depth // 8)`` per the spec — sub-byte depths filter with a
    1-byte left offset). ``filter_type`` is 0-4 applied uniformly, or
    ``"adaptive"`` — per row, the filter with the minimum sum of absolute
    signed residuals (the standard libpng row chooser), so encoded streams
    mix filter types row-by-row. Fully vectorized: the forward direction
    sees the whole raw raster; the decoder's inverse is the
    independently-written sequential reconstruction."""
    if filter_type != "adaptive" and filter_type not in range(5):
        raise ValueError(f"unknown PNG filter type {filter_type!r}")
    h = raw.shape[0]
    prev = np.zeros_like(raw[0])
    rows = []
    for y in range(h):
        cur = raw[y].astype(np.int16)
        left = np.zeros_like(cur)
        left[bpp:] = cur[:-bpp]
        up = prev.astype(np.int16)
        upleft = np.zeros_like(up)
        upleft[bpp:] = up[:-bpp]
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        paeth = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
        residuals = {
            0: cur,
            1: cur - left,
            2: cur - up,
            3: cur - (left + up) // 2,
            4: cur - paeth,
        }
        if filter_type == "adaptive":
            ft = min(residuals, key=lambda k: int(np.abs(residuals[k]).sum()))
        else:
            ft = filter_type
        rows.append(bytes([ft]) + (residuals[ft] & 0xFF).astype(np.uint8).tobytes())
        prev = raw[y]
    return b"".join(rows)


def _adam7_pass_dims(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """Per-pass (x0, y0, dx, dy, pass_width, pass_height); empty passes
    keep zero dims (they contribute no bytes to the stream)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = max(0, (w - x0 + dx - 1) // dx)
        ph = max(0, (h - y0 + dy - 1) // dy)
        out.append((x0, y0, dx, dy, pw, ph))
    return out


def encode_png(
    img: np.ndarray, filter_type: int | str = "adaptive", interlace: bool = False
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB (or (h, w, 4) RGBA, or (h, w) gray,
    or (h, w, 2) gray+alpha) array as a standard 8-bit PNG.

    ``interlace=True`` emits Adam7: the raster is split into the seven
    pass sub-images, each filtered independently (filter state resets per
    pass), concatenated in pass order into one IDAT stream."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if interlace:
        parts = []
        for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(w, h):
            if pw == 0 or ph == 0:
                continue
            sub = img[y0::dy, x0::dx].reshape(ph, pw * ch)
            parts.append(_filter_scanlines(sub, ch, filter_type))
        stream = b"".join(parts)
    else:
        stream = _filter_scanlines(img.reshape(h, w * ch), ch, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(stream, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_paletted(
    img: np.ndarray, bit_depth: int | None = None, filter_type: int | str = "adaptive"
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image as a paletted (color type 3)
    PNG. The palette is the image's unique colors in first-appearance
    order; ``bit_depth`` (1/2/4/8, default = smallest that fits) packs
    indices MSB-first within each scanline byte."""
    import zlib

    h, w, _ = img.shape
    flat = np.ascontiguousarray(img, dtype=np.uint8).reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    # first-appearance order (np.unique sorts): remap through argsort of
    # first occurrence so fixture palettes read naturally
    first_pos = np.full(len(colors), len(flat), dtype=np.int64)
    np.minimum.at(first_pos, inverse, np.arange(len(flat)))
    order = np.argsort(first_pos, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    palette = colors[order]
    idx = rank[inverse].reshape(h, w)
    min_depth = next(d for d in (1, 2, 4, 8) if len(palette) <= (1 << d))
    depth = bit_depth or min_depth
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"invalid paletted bit depth {depth}")
    if len(palette) > (1 << depth):
        raise ValueError(
            f"{len(palette)} colors do not fit in {depth}-bit palette indices"
        )
    if depth == 8:
        raw = idx.astype(np.uint8)
    else:
        # pack depth-bit indices MSB-first per scanline byte
        per = 8 // depth
        pad_w = (w + per - 1) // per * per
        padded = np.zeros((h, pad_w), dtype=np.uint8)
        padded[:, :w] = idx
        bits = (
            (padded[:, :, None] >> np.arange(depth - 1, -1, -1)[None, None, :]) & 1
        ).astype(np.uint8)
        raw = np.packbits(bits.reshape(h, pad_w * depth), axis=1)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(_filter_scanlines(raw, 1, filter_type), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct PNG scanlines from a decompressed filtered stream
    segment shaped (h, stride + 1) — byte-level, so every bit depth works
    (``bpp`` = byte distance to the left pixel, ≥ 1).

    Filters None/Up are whole-row vector ops; Sub is a strided uint8 cumsum
    (wraparound addition is exactly mod-256 prefix sum); Average/Paeth carry
    an intra-row dependency on the reconstructed left pixel, so those rows
    walk pixel-by-pixel over ``bpp``-byte slices."""
    arr = data.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    n_px = stride // bpp
    for y in range(h):
        ft = int(arr[y, 0])
        row = arr[y, 1:].copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub: mod-256 prefix sum along each byte lane
            row = np.cumsum(row.reshape(n_px, bpp), axis=0, dtype=np.uint8).reshape(stride)
        elif ft == 2:  # Up
            row += prev
        elif ft == 3:  # Average
            pr = prev.astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            for x in range(n_px):
                i = x * bpp
                row[i : i + bpp] = (
                    row[i : i + bpp] + ((left + pr[i : i + bpp]) // 2).astype(np.uint8)
                )
                left = row[i : i + bpp].astype(np.int16)
        elif ft == 4:  # Paeth
            pr = prev.astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            for x in range(n_px):
                i = x * bpp
                up = pr[i : i + bpp]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                row[i : i + bpp] = row[i : i + bpp] + pred.astype(np.uint8)
                upleft = up
                left = row[i : i + bpp].astype(np.int16)
        else:
            raise ValueError(f"invalid PNG filter type {ft} on row {y}")
        out[y] = row
        prev = row
    return out


def _rows_to_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(h, stride) reconstructed scanline bytes → (h, w, ch) uint8 samples.

    16-bit samples keep the high byte (the standard 16→8 downscale);
    sub-byte depths unpack MSB-first and are returned as RAW values
    (palette indices or small gray levels — the caller scales gray)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch)
    if depth == 16:
        return rows[:, : w * ch * 2].reshape(h, w, ch, 2)[:, :, :, 0]
    # depth 1/2/4, ch == 1: unpack bits MSB-first, regroup depth bits
    bits = np.unpackbits(rows, axis=1)
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (vals * weights[None, None, :]).sum(axis=2).astype(np.uint8)[:, :w, None]


def _decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to (h, w, 3) uint8 RGB — gray is channel-broadcast
    (sub-byte gray levels scale to full range), palette indices look up
    PLTE, alpha is dropped, 16-bit keeps the high byte. Handles all five
    color types, bit depths 1/2/4/8/16, and Adam7 interlacing; chunk CRCs
    are verified and malformed structure is rejected with descriptive
    errors."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if w == 0 or h == 0:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    allowed = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
    if color_type not in allowed:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if depth not in allowed[color_type]:
        raise ValueError(
            f"invalid PNG bit depth {depth} for color type {color_type}"
        )
    if color_type == 3 and plte is None:
        raise ValueError("paletted PNG missing PLTE chunk")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = max(1, ch * depth // 8)
    stream = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)

    def row_stride(width: int) -> int:
        return (width * ch * depth + 7) // 8

    if interlace == 0:
        stride = row_stride(w)
        if stream.size != h * (stride + 1):
            raise ValueError(
                f"PNG stream length {stream.size} != expected {h * (stride + 1)}"
            )
        img = _rows_to_samples(_png_unfilter(stream, h, stride, bpp), w, ch, depth)
    else:  # Adam7: seven independently-filtered pass sub-images
        img = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(w, h):
            if pw == 0 or ph == 0:
                continue
            stride = row_stride(pw)
            seg = stream[off : off + ph * (stride + 1)]
            if seg.size != ph * (stride + 1):
                raise ValueError("truncated Adam7 PNG stream")
            off += seg.size
            img[y0::dy, x0::dx] = _rows_to_samples(
                _png_unfilter(seg, ph, stride, bpp), pw, ch, depth
            )
        if off != stream.size:
            raise ValueError("trailing bytes after final Adam7 pass")
    if color_type == 3:
        if int(img.max()) >= len(plte):
            raise ValueError(
                f"palette index {int(img.max())} out of range (PLTE has {len(plte)})"
            )
        return plte[img[:, :, 0]]
    if color_type == 0:
        if depth < 8:  # scale small gray levels to full 8-bit range
            img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.repeat(img, 3, axis=2)
    if color_type == 4:  # gray+alpha → broadcast gray, drop alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])


# ---- REAL codec: GIF (87a/89a) — pure stdlib+numpy, including a genuine
# variable-width LZW coder in both directions. The decoder handles global
# and local color tables, the 4-pass row interlace, transparency via the
# Graphic Control Extension (transparent pixels composite over the
# background color for a still decode), and skips all other extensions;
# the encoder emits a single-frame GIF87a with a first-appearance-order
# global color table and real LZW output (dictionary resets on overflow,
# per the spec). Encoder and decoder are independently written and pin
# each other in roundtrip tests.

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    LSB-first bit packing, CLEAR resets the dictionary, width grows when
    the next code would not fit (capped at 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    # bitstream as one integer cursor over LSB-first packed codes
    bits = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    out: list[int] = []
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended without END code")
            bits |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bits & ((1 << width) - 1)
        bits >>= width
        nbits -= width
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW first code {code} out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} beyond table ({len(table)})")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_decode`: greedy longest-match dictionary
    build keyed on (prefix_code, next_byte); emits CLEAR and resets when
    the table hits 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bits = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bits, nbits
        bits |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = clear + 2
    emit(clear, width)
    prev = -1
    for b in indices.tolist():
        if prev < 0:
            prev = b
            continue
        key = (prev, b)
        if key in table:
            prev = table[key]
            continue
        emit(prev, width)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table.clear()
            next_code = clear + 2
            width = min_code_size + 1
        prev = b
    if prev >= 0:
        emit(prev, width)
    emit(end, width)
    if nbits:
        out.append(bits & 0xFF)
    return bytes(out)


def _gif_color_table(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette, (h, w) index raster) in first-appearance order; raises a
    descriptive error beyond 256 colors (this encoder does not quantize)."""
    h, w, _ = img.shape
    flat = np.ascontiguousarray(img, dtype=np.uint8).reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF encoding needs <=256 colors, image has {len(colors)} "
            "(quantize first; resize of a GIF input keeps its palette subset)"
        )
    first_pos = np.full(len(colors), len(flat), dtype=np.int64)
    np.minimum.at(first_pos, inverse, np.arange(len(flat)))
    order = np.argsort(first_pos, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return colors[order], rank[inverse].reshape(h, w)


def encode_gif(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (≤256 unique colors) as a
    single-frame non-interlaced GIF87a with a global color table."""
    h, w, _ = img.shape
    palette, idx = _gif_color_table(img)
    bits = max(1, int(len(palette) - 1).bit_length())  # GCT size field: 2^(n+1) entries
    table = np.zeros(((1 << bits), 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code_size = max(2, bits)
    lzw = _lzw_encode(idx.reshape(-1).astype(np.int64), min_code_size)
    sub_blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
        + table.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code_size])
        + sub_blocks
        + b"\x00\x3b"
    )


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image frame of a GIF87a/89a to (h, w, 3) uint8 RGB.

    Composites the frame onto the logical screen (background color fill),
    honors a local color table and the interlace flag, and treats a GCE
    transparent index as 'keep the background pixel'. Non-image extension
    blocks are skipped by their sub-block structure."""
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg_idx, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent = -1

    def skip_sub_blocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            ln = payload[p]
            p += 1 + ln
            if ln == 0:
                return p

    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos + 1]
            if label == 0xF9:  # Graphic Control Extension
                flags = payload[pos + 3]
                if flags & 0x01:
                    transparent = payload[pos + 6]
            pos = skip_sub_blocks(pos + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            table = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table (global or local)")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while True:
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(payload[pos : pos + ln])
            pos += ln
        indices = np.array(
            _lzw_decode(b"".join(chunks), min_code_size), dtype=np.int64
        )
        if indices.size != fw * fh:
            raise ValueError(
                f"GIF frame decoded {indices.size} pixels, expected {fw * fh}"
            )
        if int(indices.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index out of color-table range")
        frame = indices.reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: rows arrive in 4 passes
            deinterlaced = np.empty_like(frame)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                n_rows = len(range(start, fh, step))
                deinterlaced[start::step] = frame[src : src + n_rows]
                src += n_rows
            frame = deinterlaced
        # composite the first frame onto the logical screen
        screen_bg = gct[bg_idx] if (gct is not None and bg_idx < len(gct)) else np.zeros(3, np.uint8)
        screen = np.tile(screen_bg.astype(np.uint8), (sh, sw, 1))
        rgb = table[frame]
        if transparent >= 0:
            mask = frame != transparent
            region = screen[top : top + fh, left : left + fw]
            region[mask] = rgb[mask]
        else:
            screen[top : top + fh, left : left + fw] = rgb
        return screen
    raise ValueError("GIF contains no image frame")


def _decode_image_auto(payload: bytes) -> np.ndarray:
    """Magic-sniffing dispatch: PNG, BMP, GIF and the fake codec decode
    for real; JPEG falls through to the documented NotImplementedError
    seam."""
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:6] in _GIF_MAGICS:
        return _decode_gif(payload)
    if payload[:4] == _FAKE_MAGIC:
        return _decode_fake_image(payload)
    return _decode_real_image(payload)


_CODECS = {
    "fake": _decode_fake_image,
    "bmp": _decode_bmp,
    "png": _decode_png,
    "gif": _decode_gif,
    "auto": _decode_image_auto,
    "image": _decode_real_image,
}

_FEATURE_TYPE = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", FloatType()),
        StructField("mean_g", FloatType()),
        StructField("mean_b", FloatType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def extract_image_features(df: DataFrame, codec: str = "fake", embed_dim: int = 16) -> DataFrame:
    """Decode + feature-extract via mapInPandas: per-image channel means and
    a deterministic pooled embedding (grid-average downsample)."""
    decode = _CODECS[codec]
    g = int(np.sqrt(embed_dim))
    if g * g != embed_dim:
        raise ValueError(
            f"embed_dim must be a perfect square (grid pooling), got "
            f"{embed_dim} — the old code silently returned {g * g} cells"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["id"], pdf["media"]):
                img = decode(bytes(payload))
                h, w, _ = img.shape
                means = img.reshape(-1, 3).mean(axis=0)
                # grid-pool (luma of g×g cells); ranges clamped NON-EMPTY: an image
                # smaller than the grid previously pooled empty slices
                # into NaN embedding cells (review finding — tiny
                # thumbnails/tracking pixels are common in scraped
                # corpora); for images >= g×g the ranges are unchanged.
                luma = img.mean(axis=2)
                cells = []
                for i in range(g):
                    y0 = min(i * h // g, h - 1)
                    y1 = max((i + 1) * h // g, y0 + 1)
                    for j in range(g):
                        x0 = min(j * w // g, w - 1)
                        x1 = max((j + 1) * w // g, x0 + 1)
                        cells.append(float(luma[y0:y1, x0:x1].mean()))
                rows.append(
                    (int(mid), w, h, float(means[0]), float(means[1]), float(means[2]), cells)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FEATURE_TYPE.fields]
            )

    return df.select("id", "media").mapInPandas(run, _FEATURE_TYPE)


_RESIZE_TYPE = StructType(
    [
        StructField("id", LongType()),
        StructField("media", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "bmp":
        return encode_bmp(img)
    if fmt == "png":
        return encode_png(img)
    if fmt == "gif":
        return encode_gif(img)
    h, w, _ = img.shape
    return _FAKE_MAGIC + struct.pack("<II", w, h) + np.ascontiguousarray(img).tobytes()


def _sniff_image_format(payload: bytes) -> str:
    if payload[:8] == _PNG_MAGIC:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:6] in _GIF_MAGICS:
        return "gif"
    return "fake"


def resize_images(
    df: DataFrame, out_w: int, out_h: int, codec: str = "fake", out_codec: str | None = None
) -> DataFrame:
    """Nearest-neighbour resize, payload→payload. ``out_codec`` defaults to
    the input codec family: 'bmp'/'png' inputs re-encode in their own real
    format (so resized payloads stay readable by any image tool); with
    ``codec='auto'`` the output format is sniffed per payload from its
    magic (PNG→PNG, BMP→BMP, GIF→GIF, else fake), so mixed-format batches
    each keep their native encoding; everything else emits the fake-codec
    format. GIF re-encode never needs a quantizer here: nearest-neighbour
    sampling picks existing pixels, so the output palette is a subset of
    the input's."""
    decode = _CODECS[codec]
    if out_codec is None and codec in ("bmp", "png", "gif"):
        out_codec = codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["id"], pdf["media"]):
                buf = bytes(payload)
                img = decode(buf)
                h, w, _ = img.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = np.ascontiguousarray(img[np.ix_(yi, xi)])
                fmt = out_codec or (_sniff_image_format(buf) if codec == "auto" else "fake")
                rows.append((int(mid), _encode_image(small, fmt), out_w, out_h))
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_TYPE.fields])

    return df.select("id", "media").mapInPandas(run, _RESIZE_TYPE)


_FAKE_AUDIO_MAGIC = b"FAUD"
_FAKE_VIDEO_MAGIC = b"FVID"


def fake_encode_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """Deterministic fake audio payload: magic + rate + count + int16 PCM."""
    rng = np.random.default_rng(
        int.from_bytes(hashlib.md5(f"aud:{seed}".encode()).digest()[:8], "big")
    )
    pcm = rng.integers(-(2**14), 2**14, size=n_samples, dtype=np.int16)
    return _FAKE_AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + pcm.tobytes()


def _decode_fake_audio(payload: bytes) -> tuple[int, np.ndarray]:
    if payload[:4] != _FAKE_AUDIO_MAGIC:
        raise ValueError("not a fake audio payload")
    rate, n = struct.unpack("<II", payload[4:12])
    return rate, np.frombuffer(payload[12:], dtype=np.int16)[:n]


def _decode_real_audio(payload: bytes):  # pragma: no cover
    raise NotImplementedError(
        "mp3/flac decoding requires librosa/soundfile (not in this "
        "container); use codec='wav' (real, stdlib), codec='fake', or "
        "register a codec"
    )


# ---- REAL codec: WAV (PCM 16-bit) via the stdlib wave module — the
# audio twin of the BMP codec: a genuinely decodable container format.


def encode_wav(sample_rate: int, pcm: np.ndarray) -> bytes:
    """Encode mono int16 PCM as a WAV payload (stdlib wave module)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(pcm, dtype=np.int16).tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM-16 WAV payload to (rate, mono int16 samples) — stereo
    inputs are mono-ized by channel mean (the standard feature-extraction
    convention)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"only PCM-16 WAV supported (width={wf.getsampwidth()})")
        rate = wf.getframerate()
        nch = wf.getnchannels()
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype=np.int16)
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return rate, pcm


def _decode_audio_auto(payload: bytes) -> tuple[int, np.ndarray]:
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    if payload[:4] == _FAKE_AUDIO_MAGIC:
        return _decode_fake_audio(payload)
    return _decode_real_audio(payload)


_AUDIO_CODECS = {
    "fake": _decode_fake_audio,
    "wav": _decode_wav,
    "auto": _decode_audio_auto,
    "audio": _decode_real_audio,
}

_AUDIO_FEATURE_TYPE = StructType(
    [
        StructField("id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_sec", FloatType()),
        StructField("rms", FloatType()),
        StructField("peak", FloatType()),
        StructField("zero_cross_rate", FloatType()),
    ]
)


def extract_audio_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode + per-clip audio features (duration, RMS, peak, zero-crossing
    rate) via mapInPandas — one Arrow batch of payloads in, bounded memory."""
    decode = _AUDIO_CODECS[codec]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["id"], pdf["media"]):
                rate, pcm = decode(bytes(payload))
                x = pcm.astype(np.float32) / 2**15
                zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                rows.append(
                    (
                        int(mid),
                        int(rate),
                        float(len(x) / rate) if rate else 0.0,
                        float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                        float(np.abs(x).max()) if len(x) else 0.0,
                        zc,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _AUDIO_FEATURE_TYPE.fields])

    return df.select("id", "media").mapInPandas(run, _AUDIO_FEATURE_TYPE)


def fake_encode_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic fake video payload: magic + dims + frame count + frames
    of raw RGB (each frame md5-seeded so frames differ deterministically)."""
    out = [_FAKE_VIDEO_MAGIC, struct.pack("<III", width, height, n_frames)]
    for f in range(n_frames):
        rng = np.random.default_rng(
            int.from_bytes(hashlib.md5(f"vid:{seed}:{f}".encode()).digest()[:8], "big")
        )
        out.append(
            rng.integers(0, 256, size=width * height * 3, dtype=np.uint8).tobytes()
        )
    return b"".join(out)


# ---- REAL codec: AVI (RIFF container, uncompressed 24-bit DIB frames) —
# the video twin of BMP/WAV: stdlib struct + numpy only, and the payloads
# are genuinely playable by external tools (ffmpeg/VLC read 'DIB ' AVIs).
# Compressed codecs inside the container (MJPEG/H.264) remain the
# documented NotImplementedError seam alongside JPEG/mp3.


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode an (n, h, w, 3) uint8 RGB frame stack as an uncompressed
    AVI ('DIB ' fourcc): RIFF → hdrl(avih + strl(strh/strf)) → movi with
    one '00db' chunk per frame, each a bottom-up BGR DIB with 4-byte row
    padding (the BMP body layout)."""
    n, h, w, _ = frames.shape
    row_bytes = (w * 3 + 3) & ~3
    frame_size = row_bytes * h

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" * (len(data) & 1))

    def dib(img: np.ndarray) -> bytes:
        body = np.zeros((h, row_bytes), dtype=np.uint8)
        body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        return body.tobytes()

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags (no index chunk — players fall back to sequential reads)
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
    movi = b"movi" + b"".join(chunk(b"00db", dib(frames[i])) for i in range(n))
    riff_body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _iter_avi_frames(payload: bytes):
    """Yield (frame_idx, w, h, (h, w, 3) RGB uint8) from an uncompressed
    AVI, one frame at a time — the full frame stack is never materialized.
    Rejects compressed streams (non-'DIB '/raw fourcc or biCompression≠0)
    and non-24-bit frames explicitly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            yield fourcc, pos + 8, size
            pos += 8 + size + (size & 1)

    w = h = bpp = comp = None
    movi_spans = []
    for fourcc, dpos, size in walk(payload, 12, len(payload)):
        if fourcc != b"LIST":
            continue
        kind = payload[dpos : dpos + 4]
        if kind == b"hdrl":
            for fc2, dp2, sz2 in walk(payload, dpos + 4, dpos + size):
                if fc2 == b"LIST" and payload[dp2 : dp2 + 4] == b"strl":
                    strh = strf = None
                    for fc3, dp3, sz3 in walk(payload, dp2 + 4, dp2 + sz2):
                        if fc3 == b"strh":
                            strh = payload[dp3 : dp3 + sz3]
                        elif fc3 == b"strf":
                            strf = payload[dp3 : dp3 + sz3]
                    if strh and strh[:4] == b"vids":
                        handler = strh[4:8]
                        if handler not in (b"DIB ", b"\x00\x00\x00\x00"):
                            raise ValueError(
                                f"compressed AVI stream {handler!r} not supported "
                                "(only uncompressed 'DIB ')"
                            )
                        _, w, h, _, bpp, comp = struct.unpack("<IiiHHI", strf[:20])
                        if comp != 0 or bpp != 24:
                            raise ValueError(
                                f"unsupported AVI frames (bpp={bpp}, compression={comp})"
                            )
        elif kind == b"movi":
            movi_spans.append((dpos + 4, dpos + size))
    if w is None:
        raise ValueError("AVI missing video stream headers")
    # negative biHeight = TOP-DOWN rows (valid DIB, same convention
    # _decode_bmp honors) — collapsing it with abs() and flipping
    # unconditionally rendered such AVIs upside down (review finding)
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    fi = 0
    for start, end in movi_spans:
        for fourcc, dpos, size in walk(payload, start, end):
            if fourcc[2:4] not in (b"db", b"dc"):
                continue
            raw = np.frombuffer(payload, dtype=np.uint8, count=h * row_bytes, offset=dpos)
            rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
            rgb = rows[:, :, ::-1] if top_down else rows[::-1, :, ::-1]
            yield fi, w, h, rgb  # BGR → RGB, rows top-down either way
            fi += 1


def _iter_fake_frames(payload: bytes):
    if payload[:4] != _FAKE_VIDEO_MAGIC:
        raise ValueError("not a fake video payload")
    w, h, n = struct.unpack("<III", payload[4:16])
    fsz = w * h * 3
    for fi in range(n):
        frame = np.frombuffer(payload, dtype=np.uint8, count=fsz, offset=16 + fi * fsz)
        yield fi, w, h, frame.reshape(h, w, 3)


def _iter_video_auto(payload: bytes):
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return _iter_avi_frames(payload)
    if payload[:4] == _FAKE_VIDEO_MAGIC:
        return _iter_fake_frames(payload)
    raise NotImplementedError(
        "mp4/mkv decoding requires pyav/cv2 (not in this container); "
        "use codec='avi' (real, stdlib), codec='fake', or register a codec"
    )


_VIDEO_CODECS = {
    "fake": _iter_fake_frames,
    "avi": _iter_avi_frames,
    "auto": _iter_video_auto,
}

_FRAME_TYPE = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("media", BinaryType()),  # standalone image payload per frame
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def sample_frames(df: DataFrame, stride: int = 10, codec: str = "fake") -> DataFrame:
    """Frame-sampling: every ``stride``-th frame of each video becomes one
    output row whose payload is a standalone image (so the sampled frames
    feed directly into extract_image_features / resize_images — adjacent
    mapInPandas stages stay in one python worker stage). Real AVI inputs
    emit real BMP frame payloads; fake inputs emit fake-image payloads;
    ``codec='auto'`` sniffs per payload.

    Memory note: frames are sliced straight out of the payload buffer one
    at a time — the full frame stack is never materialized."""
    it = _VIDEO_CODECS[codec]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["id"], pdf["media"]):
                buf = bytes(payload)
                real = buf[:4] == b"RIFF"
                for fi, w, h, frame in it(buf):
                    if fi % max(stride, 1):
                        continue
                    out = encode_bmp(np.ascontiguousarray(frame)) if real else (
                        _FAKE_MAGIC + struct.pack("<II", w, h) + frame.tobytes()
                    )
                    rows.append((int(mid), fi, out, w, h))
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_TYPE.fields])

    return df.select("id", "media").mapInPandas(run, _FRAME_TYPE)


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Per-type media profile. Honest I/O note (review finding): the
    ``total_bytes`` aggregate needs per-row payload LENGTHS, so the scan
    does read the binary column — parquet has no pushed-down length
    metadata. At 100 TB, store the size as a meta field at ingest and
    aggregate that instead; the width/height aggregates alone prune to
    meta.* only."""
    return df.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.height").alias("avg_height"),
        F.sum(F.length("media").cast("long")).alias("total_bytes"),
    )
