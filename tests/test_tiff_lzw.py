"""TIFF LZW / PackBits / predictor-2 decode (kernels/tiff_codec.py).

The LZW encoder here is written test-side from the COMPRESSION half of
the TIFF6 spec (the codec only ships the decoder), so encoder/decoder
bugs can't cancel except through a shared spec misreading — which the
fixed hand-packed anchor stream below guards against."""
import struct

import numpy as np
import pytest

from whitebox_tools_ray.kernels import tiff_codec as T


def lzw_encode(data: bytes) -> bytes:
    """TIFF6 §13 compression side, with early change."""
    CLEAR, EOI = 256, 257
    out_bits = []
    width = 9

    def emit(code):
        out_bits.extend((code >> (width - 1 - i)) & 1 for i in range(width))

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # early change: width grows when next_code reaches 2^w - 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code > 4093:  # table full: restart
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(EOI)
    bits = out_bits + [0] * ((-len(out_bits)) % 8)
    return bytes(
        int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)
    )


class TestLzw:
    def test_spec_worked_example(self):
        # TIFF6's classic 777 88 77 66 sequence; codes hand-derived:
        # CLEAR 7 258 8 8 258 6 6 EOI, all 9-bit
        codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]
        bits = []
        for c in codes:
            bits.extend((c >> (8 - i)) & 1 for i in range(9))
        bits += [0] * ((-len(bits)) % 8)
        stream = bytes(
            int("".join(map(str, bits[i : i + 8])), 2)
            for i in range(0, len(bits), 8)
        )
        assert T._lzw_decode(stream) == b"\x07\x07\x07\x08\x08\x07\x07\x06\x06"
        # and the test-side encoder produces the identical stream
        assert lzw_encode(b"\x07\x07\x07\x08\x08\x07\x07\x06\x06") == stream

    @pytest.mark.parametrize("n", [1, 300, 5000, 40000])
    def test_round_trip_random_and_runny(self, n):
        rng = np.random.default_rng(n)
        # low-entropy data exercises width growth + table restarts
        data = bytes(rng.integers(0, 8, n, dtype=np.uint8))
        assert T._lzw_decode(lzw_encode(data)) == data

    def test_width_transitions(self):
        # incompressible data drives next_code past 511/1023/2047
        rng = np.random.default_rng(1)
        data = bytes(rng.integers(0, 256, 20000, dtype=np.uint8))
        assert T._lzw_decode(lzw_encode(data)) == data


class TestPackBits:
    def test_spec_example(self):
        # TIFF6 §9 worked example: FE AA | 02 80 00 2A | FD AA | 03 80
        # 00 2A 22 | F7 AA  →  3×AA, 80 00 2A, 4×AA, 80 00 2A 22, 10×AA
        enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
        expect = (b"\xaa" * 3 + b"\x80\x00\x2a" + b"\xaa" * 4 +
                  b"\x80\x00\x2a\x22" + b"\xaa" * 10)
        assert T._packbits_decode(enc) == expect

    def test_runs(self):
        data = b"\x05" * 300 + b"\x01\x02\x03" + b"\x07" * 2
        # encode test-side: naive RLE
        enc = bytearray()
        i = 0
        while i < len(data):
            j = i
            while j < len(data) and j - i < 128 and data[j] == data[i]:
                j += 1
            if j - i >= 2:
                enc += bytes([257 - (j - i), data[i]])
                i = j
            else:
                k = i
                while k < len(data) and k - i < 128 and (
                    k + 1 >= len(data) or data[k] != data[k + 1]
                ):
                    k += 1
                enc += bytes([k - i - 1]) + data[i:k]
                i = k
        assert T._packbits_decode(bytes(enc)) == data


def _build_tiff(grid: np.ndarray, comp: int, predictor: int = 1,
                rows_per_strip: int = 4) -> bytes:
    """Minimal little-endian stripped uint8 TIFF assembled by hand."""
    h, w = grid.shape
    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = grid[r0 : r0 + rows_per_strip].astype(np.uint8)
        if predictor == 2:
            d = rows.astype(np.int16)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            rows = (d & 0xFF).astype(np.uint8)
        raw = rows.tobytes()
        if comp == 5:
            strips.append(lzw_encode(raw))
        elif comp == 1:
            strips.append(raw)
        else:
            raise ValueError
    n_strips = len(strips)

    tags = []  # (tag, type, count, value_or_bytes)
    def add(tag, typ, count, val):
        tags.append((tag, typ, count, val))

    # layout: header(8) + IFD + external arrays + strip data
    n_tags_planned = 10
    ifd_size = 2 + n_tags_planned * 12 + 4
    ext = bytearray()
    ext_base = 8 + ifd_size

    def ext_put(data: bytes) -> int:
        off = ext_base + len(ext)
        ext.extend(data)
        return off

    strip_offsets = []
    strip_counts = [len(s) for s in strips]
    # strip data goes after external arrays; fill offsets later
    add(256, 3, 1, w)
    add(257, 3, 1, h)
    add(258, 3, 1, 8)
    add(259, 3, 1, comp)
    add(262, 3, 1, 1)
    add(277, 3, 1, 1)
    add(278, 3, 1, rows_per_strip)
    add(317, 3, 1, predictor)
    if n_strips == 1:
        off_entry = ("inline", 0)
        cnt_entry = ("inline", strip_counts[0])
    else:
        off_entry = ("ext", None)
        cnt_entry = ("ext", ext_put(struct.pack(f"<{n_strips}I", *strip_counts)))
    # reserve the offsets array slot
    if n_strips > 1:
        off_arr_pos = ext_put(b"\x00" * (4 * n_strips))
    data_base = ext_base + len(ext)
    pos = data_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    if n_strips > 1:
        ext[off_arr_pos - ext_base : off_arr_pos - ext_base + 4 * n_strips] = \
            struct.pack(f"<{n_strips}I", *strip_offsets)
        add(273, 4, n_strips, off_arr_pos)
        add(279, 4, n_strips, cnt_entry[1])
    else:
        add(273, 4, 1, strip_offsets[0])
        add(279, 4, 1, strip_counts[0])

    tags.sort(key=lambda t: t[0])
    assert len(tags) == n_tags_planned
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(tags))
    for tag, typ, count, val in tags:
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    out += ext
    for s in strips:
        out += s
    return bytes(out)


class TestParseLzwTiff:
    @pytest.mark.parametrize("predictor", [1, 2])
    def test_lzw_stripped_uint8(self, predictor):
        rng = np.random.default_rng(4)
        # smooth-ish data so predictor 2 actually changes the bytes
        base = np.cumsum(rng.integers(-2, 3, (16, 24)), axis=1)
        grid = np.clip(base + 50, 0, 255).astype(np.uint8)
        buf = _build_tiff(grid, comp=5, predictor=predictor)
        parsed = T.parse_geotiff(buf)
        np.testing.assert_array_equal(parsed["grid"], grid.astype(np.float64))

    def test_uncompressed_predictor2(self):
        grid = (np.arange(8 * 12, dtype=np.uint8).reshape(8, 12) * 3) % 251
        buf = _build_tiff(grid, comp=1, predictor=2)
        parsed = T.parse_geotiff(buf)
        np.testing.assert_array_equal(parsed["grid"], grid.astype(np.float64))


def _build_rgb_tiff(pix: np.ndarray, comp: int, predictor: int = 1,
                    spp: int = 3, rows_per_strip: int = 4) -> bytes:
    """Minimal little-endian chunky 8-bit RGB(A) stripped TIFF."""
    h, w, _ = pix.shape
    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = pix[r0 : r0 + rows_per_strip].astype(np.uint8)
        if predictor == 2:
            d = rows.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            rows = (d & 0xFF).astype(np.uint8)
        raw = rows.tobytes()
        strips.append(lzw_encode(raw) if comp == 5 else raw)
    n_strips = len(strips)

    tags = []
    def add(tag, typ, count, val):
        tags.append((tag, typ, count, val))

    n_tags_planned = 11
    ifd_size = 2 + n_tags_planned * 12 + 4
    ext = bytearray()
    ext_base = 8 + ifd_size

    def ext_put(data: bytes) -> int:
        off = ext_base + len(ext)
        ext.extend(data)
        return off

    add(256, 3, 1, w)
    add(257, 3, 1, h)
    # BitsPerSample: count=spp, needs external array of u16
    bits_off = ext_put(struct.pack(f"<{spp}H", *([8] * spp)))
    add(258, 3, spp, bits_off)
    add(259, 3, 1, comp)
    add(262, 3, 1, 2)  # RGB photometric
    add(277, 3, 1, spp)
    add(278, 3, 1, rows_per_strip)
    add(284, 3, 1, 1)  # chunky
    add(317, 3, 1, predictor)
    cnts = [len(s) for s in strips]
    if n_strips == 1:
        data_base = ext_base + len(ext)
        add(273, 4, 1, data_base)  # count-1 LONG: value is inline
        add(279, 4, 1, cnts[0])
    else:
        cnt_off = ext_put(struct.pack(f"<{n_strips}I", *cnts))
        off_arr_pos = ext_put(b"\x00" * (4 * n_strips))
        data_base = ext_base + len(ext)
        pos = data_base
        offsets = []
        for s in strips:
            offsets.append(pos)
            pos += len(s)
        ext[off_arr_pos - ext_base : off_arr_pos - ext_base + 4 * n_strips] = \
            struct.pack(f"<{n_strips}I", *offsets)
        add(273, 4, n_strips, off_arr_pos)
        add(279, 4, n_strips, cnt_off)

    tags.sort(key=lambda t: t[0])
    assert len(tags) == n_tags_planned
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(tags))
    for tag, typ, count, val in tags:
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)
    out += ext
    for s in strips:
        out += s
    return bytes(out)


class TestRgbTiff:
    @pytest.mark.parametrize("comp,predictor", [(1, 1), (5, 1), (5, 2)])
    def test_rgb_packed_parity(self, comp, predictor):
        rng = np.random.default_rng(6)
        pix = np.cumsum(rng.integers(0, 3, (10, 12, 3)), axis=1).astype(np.uint8)
        buf = _build_rgb_tiff(pix, comp=comp, predictor=predictor)
        parsed = T.parse_geotiff(buf)
        assert parsed["meta"]["samples_per_pixel"] == 3
        r = pix[..., 0].astype(np.int64)
        g = pix[..., 1].astype(np.int64)
        b = pix[..., 2].astype(np.int64)
        expect = (255 << 24) | (b << 16) | (g << 8) | r
        np.testing.assert_array_equal(parsed["grid"], expect.astype(np.float64))

    def test_rgba_alpha_channel(self):
        pix = np.zeros((4, 4, 4), dtype=np.uint8)
        pix[..., 0] = 7
        pix[..., 3] = 128
        buf = _build_rgb_tiff(pix, comp=1, spp=4)
        parsed = T.parse_geotiff(buf)
        expect = (128 << 24) | 7
        assert (parsed["grid"] == float(expect)).all()

    def test_planar_rejected(self):
        pix = np.zeros((4, 4, 3), dtype=np.uint8)
        buf = bytearray(_build_rgb_tiff(pix, comp=1))
        # flip PlanarConfiguration (tag 284) value to 2
        i = buf.find(struct.pack("<HHI", 284, 3, 1))
        buf[i + 8] = 2
        with pytest.raises(NotImplementedError):
            T.parse_geotiff(bytes(buf))


class TestBigTiff:
    @staticmethod
    def _write_bigtiff(grid):
        """Hand-rolled minimal BigTIFF (magic 43, 8-byte offsets): one
        uncompressed strip of f32 samples + pixel scale/tiepoint."""
        import struct

        h, w = grid.shape
        data = grid.astype("<f4").tobytes()
        entries = []  # (tag, type, count, value-bytes (8) or payload)

        def val8(fmt, *vals):
            b = struct.pack("<" + fmt, *vals)
            return b + b"\x00" * (8 - len(b))

        header = 16
        n_tags = 9
        ifd_size = 8 + n_tags * 20 + 8
        data_off = header + ifd_size
        scale_off = data_off + len(data)
        tie_off = scale_off + 24
        entries = [
            (256, 16, 1, val8("Q", w)),
            (257, 16, 1, val8("Q", h)),
            (258, 3, 1, val8("H", 32)),
            (259, 3, 1, val8("H", 1)),
            (273, 16, 1, val8("Q", data_off)),       # StripOffsets
            (278, 16, 1, val8("Q", h)),               # RowsPerStrip
            (279, 16, 1, val8("Q", len(data))),       # StripByteCounts
            (339, 3, 1, val8("H", 3)),                # SampleFormat float
            (33550, 12, 3, val8("Q", scale_off)),     # ModelPixelScale ptr
        ]
        out = bytearray()
        out += b"II" + struct.pack("<HHHQ", 43, 8, 0, 16)
        out += struct.pack("<Q", n_tags)
        for tag, typ, cnt, vb in entries:
            out += struct.pack("<HHQ", tag, typ, cnt) + vb
        out += struct.pack("<Q", 0)  # next IFD
        assert len(out) == data_off
        out += data
        out += struct.pack("<3d", 90.0, 90.0, 0.0)
        _ = tie_off
        return bytes(out)

    def test_bigtiff_roundtrip(self):
        import numpy as np

        from whitebox_tools_ray.kernels import tiff_codec

        rng = np.random.default_rng(3)
        grid = rng.uniform(0, 500, (13, 17))
        blob = self._write_bigtiff(grid)
        out = tiff_codec.parse_geotiff(blob)
        np.testing.assert_allclose(out["grid"], grid.astype(np.float32).astype(np.float64))
        assert out["meta"]["pixel_scale"][0] == 90.0


class TestProductionLzwEncoder:
    """kernels/tiff_codec._lzw_encode (the shipping writer codec) must
    agree bit-for-bit with the spec-derived test-side encoder above and
    with the hand-packed anchor stream."""

    def test_matches_spec_encoder_bitwise(self):
        rng = np.random.default_rng(5)
        cases = [
            b"", b"Z", b"\x07\x07\x07\x08\x08\x07\x07\x06\x06",
            bytes(rng.integers(0, 256, 30_000, dtype=np.uint8)),
            bytes(rng.integers(0, 5, 120_000, dtype=np.uint8)),
            bytes(range(256)) * 30,
        ]
        for data in cases:
            assert T._lzw_encode(data) == lzw_encode(data)

    def test_decoder_round_trip(self):
        rng = np.random.default_rng(9)
        data = bytes(rng.integers(0, 256, 60_000, dtype=np.uint8))
        assert T._lzw_decode(T._lzw_encode(data)) == data

    def test_writer_lzw_file_round_trip(self):
        g = ((np.arange(130)[:, None] * 31 + np.arange(90)[None, :] * 17) % 97).astype(
            np.float64
        )
        blob = T.write_geotiff(g, nodata=-9999.0, dtype="f8", compress="lzw")
        parsed = T.parse_geotiff(blob)
        assert np.array_equal(parsed["grid"], g)
        # compression tag really is LZW (5), not deflate
        bo, ifd, _ = "<", T._read_ifd(blob, "<"), None
        assert ifd[259] == 5


class TestBigTiffWrite:
    """BigTIFF (magic 43) writer: 8-byte offsets, 20-byte entries,
    LONG8 strip offsets/counts — read back through the repo's BigTIFF
    reader (which is pinned against the reference's BigTIFF branch,
    geotiff/mod.rs:50-71)."""

    def test_forced_bigtiff_round_trip(self):
        g = ((np.arange(100)[:, None] * 31 + np.arange(80)[None, :] * 17) % 97).astype(
            np.float64
        )
        for comp in ("lzw", "deflate", False):
            blob = T.write_geotiff(g, nodata=-1.0, pixel_scale=(2.0, 2.0),
                                   tiepoint=(0, 0, 0, 10, 20, 0), dtype="f8",
                                   compress=comp, bigtiff=True)
            assert struct.unpack_from("<H", blob, 2)[0] == 43
            back = T.parse_geotiff(blob)
            assert np.array_equal(back["grid"], g)
            assert back["meta"]["nodata"] == -1.0
            assert back["meta"]["pixel_scale"] == (2.0, 2.0)

    def test_auto_select_stays_classic_when_small(self):
        g = np.zeros((16, 16))
        blob = T.write_geotiff(g, dtype="f8")
        assert struct.unpack_from("<H", blob, 2)[0] == 42
