"""External COG-file ingestion tests (binaryFile source + analyze)."""

import os

import numpy as np

from cloudtiff_spark import tiff
from cloudtiff_spark.sources import analyze_cog_directory, disect

RNG = np.random.default_rng(21)


class TestCogDirectory:
    def test_binaryfile_roundtrip(self, spark, tmp_path):
        specs = {}
        for i in range(4):
            w, h = int(RNG.choice([64, 128, 300])), int(RNG.choice([64, 96, 256]))
            img = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
            data = tiff.encode_cog(img, 4326, float(i), 50.0, 1e-4)
            (tmp_path / f"scene_{i}.tif").write_bytes(data)
            specs[f"scene_{i}"] = (w, h)
        parsed = analyze_cog_directory(spark, str(tmp_path)).collect()
        by_img = {}
        for r in parsed:
            by_img.setdefault(r.image_id, []).append(r)
        assert set(by_img) == set(specs)
        for iid, rows in by_img.items():
            w, h = specs[iid]
            lv0 = next(r for r in rows if r.level == 0)
            assert (lv0.lw, lv0.lh) == (w, h)
            assert lv0.epsg == 4326

    def test_disect_dump(self):
        img = RNG.integers(0, 256, (96, 300, 3), dtype=np.uint8)
        out = disect(tiff.encode_cog(img, 32609, 500000.0, 5400000.0, 2.0))
        assert "classic endian=LE" in out
        assert "level 0 (full): 300x96 tiles 5x2@64" in out
        assert "projection epsg=32609" in out
