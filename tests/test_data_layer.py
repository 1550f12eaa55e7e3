"""Data-layer coverage: zarr-zip chunking, removal strategies, noisy oracle."""

import numpy as np
import pytest

from gnn_pressure_estimation_tpu.data.inp import parse_inp, write_inp
from gnn_pressure_estimation_tpu.data.zarrzip import (
    ZarrZipReader,
    ZarrZipWriter,
    zip_directory_store,
)
from gnn_pressure_estimation_tpu.data.dataset import WDNDataset, get_keep_list
from gnn_pressure_estimation_tpu.simgen.netgen import make_minitown


def test_zarrzip_chunked_roundtrip(tmp_path, rng):
    """Partial edge chunks, several dtypes, zlib + raw compressors."""
    arrays = {
        "a": rng.standard_normal((37, 11)),                      # f8, ragged chunks
        "b": (rng.random((5, 3)) * 100).astype(np.float32),
        "c": rng.integers(0, 1000, (64,)).astype(np.int32),
        "d": rng.random((3, 4, 5)).astype(np.float32),           # 3-D
    }
    for comp in ("zlib", None):
        path = str(tmp_path / f"t_{comp}.zip")
        with ZarrZipWriter(path, compressor=comp) as w:
            w.create_group("g")
            w.write_array("g/a", arrays["a"], chunks=(10, 4))
            w.write_array("g/b", arrays["b"], chunks=(2, -1))
            w.write_array("g/c", arrays["c"], chunks=(7,))
            w.write_array("g/d", arrays["d"], chunks=(2, 2, 2))
            w.set_attrs("g", {"k": [1, 2, 3]})
        with ZarrZipReader(path) as r:
            root = r.root()
            for name, arr in arrays.items():
                np.testing.assert_array_equal(np.asarray(root["g"][name]), arr)
            assert root["g"].attrs["k"] == [1, 2, 3]
            assert root["g"].array_keys() == ["a", "b", "c", "d"]


def test_zarrzip_directory_store_and_zip(tmp_path, rng):
    d = str(tmp_path / "store")
    arr = rng.random((8, 4))
    with ZarrZipWriter(d) as w:  # directory store
        w.write_array("x", arr)
    zp = str(tmp_path / "store.zip")
    zip_directory_store(d, zp)
    with ZarrZipReader(zp) as r:
        np.testing.assert_array_equal(np.asarray(r.root()["x"]), arr)


def test_zarrzip_unsupported_compressor_message(tmp_path):
    """Truly unsupported codecs (snappy standalone, blosclz inner) raise a
    clear error naming the codec."""
    import json, struct, zipfile

    # a blosc frame whose inner codec is blosclz (codec id 0, non-split flag)
    blosclz_frame = struct.pack("<BBBBIII", 2, 1, 0x10, 8, 16, 16, 16 + 4 + 4 + 8)
    blosclz_frame += struct.pack("<I", 20) + struct.pack("<i", 8) + b"\x01" * 8

    zp = str(tmp_path / "bad.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr(".zgroup", json.dumps({"zarr_format": 2}))
        for name, comp in (("x", {"id": "snappy"}),
                           ("y", {"id": "blosc", "cname": "blosclz"})):
            zf.writestr(f"{name}/.zarray", json.dumps({
                "zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f8",
                "compressor": comp, "fill_value": 0,
                "filters": None, "order": "C",
            }))
        zf.writestr("x/0", b"\x00" * 16)
        zf.writestr("y/0", blosclz_frame)
    with ZarrZipReader(zp) as r:
        with pytest.raises(ValueError, match="snappy"):
            r.read_array("x")
        with pytest.raises(ValueError, match="blosclz"):
            r.read_array("y")


def test_lz4_block_roundtrip(rng):
    from gnn_pressure_estimation_tpu.data.codecs import lz4_compress, lz4_decompress

    cases = [
        b"",
        b"a",
        b"abcd" * 1000,                      # highly repetitive → matches
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),   # incompressible
        np.sin(np.arange(2048) * 0.1).astype(np.float64).tobytes(),
        b"\x00" * 10000,                     # overlapping-match RLE case
    ]
    for data in cases:
        comp = lz4_compress(data)
        assert lz4_decompress(comp, len(data)) == data
    # repetitive data actually compresses
    assert len(lz4_compress(b"abcd" * 1000)) < 200


def test_blosc_frame_roundtrip(rng):
    """Split (typesize lanes) and non-split frames, all inner codecs, with
    and without shuffle, including leftover partial blocks."""
    from gnn_pressure_estimation_tpu.data.codecs import (
        blosc_compress,
        blosc_decompress,
    )

    payloads = [
        np.arange(5000, dtype=np.float64).tobytes(),          # split path, f8
        rng.standard_normal(777).astype(np.float32).tobytes(),  # leftover block
        bytes(rng.integers(0, 256, 100, dtype=np.uint8)),     # tiny, no split
        b"",
    ]
    for codec in ("lz4", "zlib", "zstd"):
        for shuf in (True, False):
            for ts in (1, 4, 8):
                for data in payloads:
                    frame = blosc_compress(data, typesize=ts, codec=codec,
                                           do_shuffle=shuf)
                    assert blosc_decompress(frame) == data, (codec, shuf, ts)
    # force multiple blocks (blocksize smaller than payload)
    data = np.arange(40000, dtype=np.float64).tobytes()
    frame = blosc_compress(data, typesize=8, blocksize=4096)
    assert blosc_decompress(frame) == data
    assert len(frame) < len(data) // 2  # it really compresses


def test_dataset_reads_blosc_store(tmp_path, rng):
    """A store written the reference's way (Blosc-lz4+shuffle chunks,
    TokenGeneratorByRange.py:592) loads through the normal dataset path."""
    wn = make_minitown()
    n_all = wn.n_nodes
    zp = str(tmp_path / "blosc_ds.zip")
    pressure = (rng.random((12, n_all)) * 60 + 20).astype(np.float64)
    with ZarrZipWriter(zp, compressor="blosc") as w:
        w.set_attrs("", {"ordered_names_by_attr": {"pressure": wn.node_names}})
        w.create_group("pressure")
        w.write_array("pressure/train", pressure[:8], chunks=(4, n_all))
        w.write_array("pressure/valid", pressure[8:10], chunks=(4, n_all))
        w.write_array("pressure/test", pressure[10:], chunks=(4, n_all))
        w.set_attrs("pressure", {
            "min": float(pressure[:8].min()), "max": float(pressure[:8].max()),
            "mean": float(pressure[:8].mean()), "std": float(pressure[:8].std()),
        })
    inp = str(tmp_path / "mini.inp")
    write_inp(wn, inp)
    ds = WDNDataset([zp], [inp], feature="pressure", from_set="train",
                    removal="keep_junction", norm_type="znorm")
    keep_names = get_keep_list(wn, "keep_junction", None, "pressure")
    keep_idx = [wn.node_names.index(n) for n in keep_names]
    assert ds.members[0].array.shape == (8, len(keep_idx))
    # values survive the codec bit-exactly (descale and compare)
    descaled = ds.members[0].array * ds.stats.std + ds.stats.mean
    np.testing.assert_allclose(
        descaled, pressure[:8][:, keep_idx].astype(np.float32), rtol=1e-6
    )


@pytest.mark.parametrize("removal,expect", [
    ("keep_junction", "junctions"),
    ("reservoir", "no_reservoirs"),
    ("tank", "no_tanks"),
    ("keep_all", "all"),
])
def test_get_keep_list_strategies(removal, expect):
    wn = make_minitown()
    kl = get_keep_list(wn, removal, None, "pressure")
    if expect == "junctions":
        assert kl == wn.junction_names
    elif expect == "no_reservoirs":
        assert set(kl) == set(wn.node_names) - set(wn.reservoir_names)
    elif expect == "no_tanks":
        assert set(kl) == set(wn.node_names) - set(wn.tank_names)
    else:
        assert kl is None


def test_keep_list_prefers_store_names():
    wn = make_minitown()
    attrs = {"ordered_names_by_attr": {"pressure": ["J3", "J1"]}}
    assert get_keep_list(wn, "keep_list", attrs, "pressure") == ["J3", "J1"]
    # falls back to junctions without attrs
    assert get_keep_list(wn, "keep_list", {}, "pressure") == wn.junction_names


def test_dataset_with_compacted_columns(tmp_path, rng):
    """Stores written with skip_nodes (compacted columns) load correctly."""
    wn = make_minitown()
    inp = str(tmp_path / "m.inp")
    write_inp(wn, inp)
    kept = wn.junction_names  # generator skipped reservoir+tank columns
    arr = 40 + rng.standard_normal((12, len(kept)))
    zp = str(tmp_path / "m.zip")
    with ZarrZipWriter(zp) as w:
        w.create_group("pressure")
        for fs, sl in (("train", slice(0, 8)), ("valid", slice(8, 10)), ("test", slice(10, 12))):
            w.write_array(f"pressure/{fs}", arr[sl])
        w.set_attrs("", {"ordered_names_by_attr": {"pressure": kept}})
    ds = WDNDataset([zp], [inp], from_set="train", removal="keep_junction")
    assert ds.members[0].array.shape == (8, len(kept))
    # columns align with template node order (junction file order)
    assert ds.members[0].kept_names == kept


def test_lz4_native_python_cross_compat(rng):
    """The C codec (data/native/codecs.cpp) and the pure-Python fallback
    interoperate in both directions; if the native lib is unavailable the
    public API already IS the Python path."""
    import gnn_pressure_estimation_tpu.data.codecs as C

    data = np.cumsum(rng.integers(-3, 4, 50000)).astype(np.int16).tobytes()
    comp_pub = C.lz4_compress(data)          # native if available
    comp_py = C._lz4_compress_py(data)
    assert C._lz4_decompress_py(comp_pub, len(data)) == data
    assert C.lz4_decompress(comp_py, len(data)) == data
    if C._native() is not None:
        assert C.lz4_decompress(comp_pub, len(data)) == data


def test_native_shuffle_matches_numpy(rng):
    """Native byte shuffle/unshuffle round-trips and matches the NumPy path."""
    import gnn_pressure_estimation_tpu.data.codecs as C

    data = bytes(rng.integers(0, 256, 1003, dtype=np.uint8))  # 1003 % 8 != 0
    for ts in (2, 4, 8):
        sh = C.shuffle_bytes(data, ts)
        n_items = len(data) // ts
        body = n_items * ts
        a = np.frombuffer(data[:body], np.uint8).reshape(n_items, ts)
        assert sh == a.T.tobytes() + data[body:]
        assert C.unshuffle_bytes(sh, ts) == data
