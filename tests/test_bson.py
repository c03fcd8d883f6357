"""BSON.jl codec + real-data bundle tests.

The reference consumes two BSON.jl blobs: data/physionet.bson
(src/dataset.jl:59-92) and data/sde_demo.bson
(experiments/sde_toy_problem.jl:8-10). These tests pin the pure-Python
codec against the actual reference blob when visible, and the
physionet BSON -> npz -> loader path end-to-end on a fabricated bundle.
"""

from pathlib import Path

import numpy as np
import pytest

from regneuralde_tpu.data import bson
from regneuralde_tpu.data import datasets as D

REF_SDE_DEMO = Path("/root/reference/data/sde_demo.bson")


class TestCodec:
    def test_roundtrip_all_dtypes(self, tmp_path):
        rng = np.random.default_rng(0)
        doc = {
            "f32": rng.standard_normal((3, 5)).astype(np.float32),
            "f64": rng.standard_normal((2, 2, 4)),
            "i64": np.arange(7, dtype=np.int64),
            "u8": np.arange(12, dtype=np.uint8).reshape(3, 4),
            "scalar_int": 42,
            "scalar_float": 2.5,
            "flag": True,
            "name": "hello",
            "nested": {"inner": np.ones((2, 3), np.float32)},
            "list": [1, 2, 3],
        }
        p = tmp_path / "t.bson"
        bson.dump_bson(p, doc)
        back = bson.load_bson(p)
        for k in ("f32", "f64", "i64", "u8"):
            np.testing.assert_array_equal(back[k], doc[k])
            assert back[k].dtype == doc[k].dtype
        np.testing.assert_array_equal(back["nested"]["inner"], doc["nested"]["inner"])
        assert back["scalar_int"] == 42 and back["scalar_float"] == 2.5
        assert back["flag"] is True and back["name"] == "hello"
        assert back["list"] == [1, 2, 3]

    def test_column_major_layout(self, tmp_path):
        # Julia arrays are column-major; a (2, 3) array's bytes must be
        # stored column-by-column and decoded back into the same values.
        arr = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
        blob = bson.dumps({"a": arr})
        # Binary payload is Fortran order: 1, 4, 2, 5, 3, 6.
        raw, _ = bson._parse_doc(blob, 0)
        payload = np.frombuffer(raw["a"]["data"], np.float32)
        np.testing.assert_array_equal(payload, [1, 4, 2, 5, 3, 6])
        np.testing.assert_array_equal(bson.loads(blob)["a"], arr)

    def test_backref_resolution(self):
        # BSON.jl dedups via a top-level _backrefs list and 1-based refs.
        inner = {
            "tag": "array",
            "type": {"tag": "datatype", "params": [], "name": ["Core", "Float32"]},
            "size": [2],
            "data": np.array([7.0, 8.0], np.float32).tobytes(),
        }
        blob = bson.dumps(
            {"_backrefs": [inner], "x": {"tag": "backref", "ref": 1}}
        )
        out = bson.loads(blob)
        np.testing.assert_array_equal(out["x"], [7.0, 8.0])

    def test_symbol_and_tuple_tags(self):
        blob = bson.dumps(
            {
                "s": {"tag": "symbol", "name": "observed_data"},
                "t": {"tag": "tuple", "data": [1, 2]},
            }
        )
        out = bson.loads(blob)
        assert out["s"] == "observed_data"
        assert out["t"] == (1, 2)

    @pytest.mark.skipif(not REF_SDE_DEMO.exists(), reason="reference blob absent")
    def test_decodes_actual_reference_blob(self):
        d = bson.load_bson(REF_SDE_DEMO)
        assert d["sde_data"].shape == (2, 30)
        assert d["sde_data_vars"].shape == (2, 30)
        assert d["sde_data"].dtype == np.float32
        # Known ground truth: u0 = [2, 0] with zero variance at t=0
        # (experiments/sde_toy_problem.jl u0).
        np.testing.assert_allclose(d["sde_data"][:, 0], [2.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(d["sde_data_vars"][:, 0], [0.0, 0.0], atol=1e-6)


def _fake_physionet_bson(path, n=40, feats=37, steps=49, seed=0):
    """Fabricate a bundle with the exact Julia layout the reference ships:
    data tensors (feats, steps, N) column-major, tp (steps, N)."""
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((feats, steps, n)).astype(np.float32)
    mask = (rng.uniform(size=data.shape) < 0.4).astype(np.float32)
    tp = np.sort(rng.uniform(0, 1, size=(steps, n)).astype(np.float32), axis=0)
    bundle = {
        "observed_data": data * mask,
        "observed_mask": mask,
        "data_to_predict": data * mask,
        "mask_predicted_data": mask,
        "observed_tp": tp,
        "tp_to_predict": tp,
    }
    bson.dump_bson(path, {"data": bundle})
    return bundle


class TestPhysionetConversion:
    def test_bson_to_npz_to_loader(self, tmp_path):
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
        import convert_physionet

        p = tmp_path / "physionet.bson"
        truth = _fake_physionet_bson(p, n=40)
        npz = convert_physionet.convert(p, tmp_path / "physionet.npz")

        with np.load(npz) as d:
            od = d["observed_data"]
            assert od.shape == (40, 49, 37)
            # Batch-major entry [n, t, f] == Julia's [f, t, n].
            np.testing.assert_allclose(
                od[3, 10, 5], truth["observed_data"][5, 10, 3]
            )
            assert d["observed_tp"].shape == (40, 49)

        train, test = D.load_physionet(8, path=str(npz))
        batch = next(iter(train))
        assert batch[0].shape == (8, 49, 37)
        assert "physionet.npz" in train.source

    def test_loader_reads_raw_bson_directly(self, tmp_path):
        p = tmp_path / "physionet.bson"
        _fake_physionet_bson(p, n=24)
        train, _ = D.load_physionet(8, path=str(p))
        od, om, dp, mp, tp, tpp = next(iter(train))
        assert od.shape == (8, 49, 37) and tp.shape == (8, 49)
        assert "physionet.bson" in train.source


class TestSdeDemoRealData:
    @pytest.mark.skipif(not REF_SDE_DEMO.exists(), reason="reference blob absent")
    def test_make_sde_demo_uses_real_bundle(self, tmp_path, monkeypatch):
        import shutil

        shutil.copy(REF_SDE_DEMO, tmp_path / "sde_demo.bson")
        monkeypatch.setenv("REGNDE_DATA_DIR", str(tmp_path))
        means, vars_, ts, source = D.make_sde_demo()
        assert source.startswith("bson:")
        ref = bson.load_bson(REF_SDE_DEMO)
        np.testing.assert_array_equal(means, ref["sde_data"].T)
        np.testing.assert_array_equal(vars_, ref["sde_data_vars"].T)
        assert ts.shape == (30,) and ts[0] == 0.0 and ts[-1] == 1.0
