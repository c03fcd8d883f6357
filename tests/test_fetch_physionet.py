"""PhysioNet 2012 preprocessing (tools/fetch_physionet.py): the pure
parse/bin/normalize pipeline, driven on synthetic raw records, ending in
the exact npz schema load_physionet consumes."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import fetch_physionet as fp  # noqa: E402

from regneuralde_tpu.data import datasets as D  # noqa: E402


def _record(rows):
    return "Time,Parameter,Value\n" + "\n".join(
        f"{t},{p},{v}" for t, p, v in rows
    )


class TestParse:
    def test_parses_known_params_and_skips_rest(self):
        txt = _record([
            ("00:00", "HR", 80), ("00:30", "HR", 90),
            ("01:00", "Temp", 37.2),
            ("00:15", "RecordID", 1234),   # descriptor: skipped
            ("02:00", "HR", -1),           # missing marker: skipped
            ("49:00", "HR", 70),           # outside 48h: kept by parse,
        ])                                  # dropped by bin_record
        triples = fp.parse_record(txt)
        assert (0.0, fp.PARAM_INDEX["HR"], 80.0) in triples
        assert (0.5, fp.PARAM_INDEX["HR"], 90.0) in triples
        assert (1.0, fp.PARAM_INDEX["Temp"], 37.2) in triples
        assert all(v != -1.0 for _, _, v in triples)
        assert len(fp.PARAMS) == 37

    def test_binning_averages_within_hourly_bins(self):
        hr = fp.PARAM_INDEX["HR"]
        data, mask = fp.bin_record([
            (0.0, hr, 80.0), (0.4, hr, 100.0),  # both bin 0 -> mean 90
            (1.0, hr, 60.0),                     # bin 1
            (49.0, hr, 50.0),                    # outside window: dropped
        ])
        assert data.shape == (49, 37) and mask.shape == (49, 37)
        assert data[0, hr] == 90.0 and mask[0, hr] == 1.0
        assert data[1, hr] == 60.0
        assert mask[2:, hr].sum() == 0

    def test_normalization_masks_and_unit_range(self):
        hr = fp.PARAM_INDEX["HR"]
        data = np.zeros((2, 49, 37), np.float32)
        mask = np.zeros_like(data)
        data[0, 0, hr], data[1, 3, hr] = 60.0, 120.0
        mask[0, 0, hr] = mask[1, 3, hr] = 1.0
        out = fp.normalize_features(data, mask)
        assert out[0, 0, hr] == 0.0 and out[1, 3, hr] == 1.0
        assert out[out != out] .size == 0  # no NaNs


class TestBundle:
    def test_end_to_end_bundle_feeds_loader(self, tmp_path):
        rng = np.random.default_rng(0)
        records = []
        for _ in range(24):
            rows = []
            for _ in range(60):
                h = rng.uniform(0, 48)
                p = fp.PARAMS[rng.integers(0, 37)]
                rows.append((f"{int(h):02d}:{int((h % 1) * 60):02d}", p,
                             round(float(rng.uniform(1, 100)), 1)))
            records.append(_record(rows))
        bundle = fp.build_bundle(records)
        assert bundle["observed_data"].shape == (24, 49, 37)
        assert bundle["observed_tp"].shape == (24, 49)
        assert set(np.unique(bundle["observed_mask"])) <= {0.0, 1.0}
        # masked entries are zero; observed values normalized to [0, 1]
        od, om = bundle["observed_data"], bundle["observed_mask"]
        np.testing.assert_allclose(od * (1 - om), 0.0)
        assert od.max() <= 1.0 and od.min() >= 0.0

        npz = tmp_path / "physionet.npz"
        np.savez_compressed(npz, **bundle)
        train, test = D.load_physionet(8, path=str(npz))
        batch = next(iter(train))
        assert batch[0].shape == (8, 49, 37)
