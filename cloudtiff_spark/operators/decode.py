"""Pixel decode stage — Arrow-batched pandas UDFs over the binary column.

Mirrors Level::extract_tile_from_bytes (/root/reference/src/cog/level.rs:
335-373): decompress (F4/F5) -> shape-validate -> raster. The phash check
reproduces FIXTURES.md T1: phash == low 64 bits of sha256(decoded pixels),
which makes the whole decode chain self-verifying against the generator.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..codecs import decode_image


@pandas_udf(LongType())
def phash_udf(data: pd.Series, fmt: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    out = np.zeros(len(data), dtype=np.int64)
    dv, fv = data.to_numpy(), fmt.to_numpy()
    wv, hv = w.to_numpy(), h.to_numpy()
    for i in range(len(out)):
        arr = decode_image(dv[i], fv[i], int(wv[i]), int(hv[i]))
        digest = hashlib.sha256(arr.tobytes()).digest()
        out[i] = np.int64(np.uint64(int.from_bytes(digest[-8:], "big")))
    return pd.Series(out)


def decode_check(images: DataFrame) -> DataFrame:
    """(image_id, fmt, phash_ok): full-decode verification of every image.

    phash_ok requires bit-exact decode for png/deflate/lzw and exact
    reproduction of the deterministic lossy decode for 'jpeg' — i.e. the
    engine-side decoder matches the generator byte-for-byte.
    """
    return images.select(
        "image_id",
        "fmt",
        (phash_udf(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h")) == F.col("phash")).alias(
            "phash_ok"
        ),
    )
