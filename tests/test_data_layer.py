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
    import json, zipfile

    zp = str(tmp_path / "blosc.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr(".zgroup", json.dumps({"zarr_format": 2}))
        zf.writestr("x/.zarray", json.dumps({
            "zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f8",
            "compressor": {"id": "blosc", "cname": "lz4"}, "fill_value": 0,
            "filters": None, "order": "C",
        }))
        zf.writestr("x/0", b"\x00" * 16)
    with ZarrZipReader(zp) as r:
        with pytest.raises(ValueError, match="blosc"):
            r.read_array("x")


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
