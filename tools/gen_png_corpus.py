"""Generate the tiny committed PNG corpus at tests/data/png_corpus/.

The corpus mirrors the production phash inputs for image docs 0/3/6/9:
base pixels are the md5-chain payload ``media_table`` builds, the twin is
the +PHASH_SHIFT brightness variant, and ids follow mm_phash_pairs'
``doc_id*2 (+1)`` scheme. Scanline filters rotate per file so the decoder
exercises every PNG filter type from committed bytes.

Regenerate with ``python tools/gen_png_corpus.py`` after an encoder
change; tests/test_media_codecs.py treats the committed bytes as golden.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_flink_pratices_spark.operators.media_codecs import PngCodec
from apache_flink_pratices_spark.operators.multimodal import (
    IMG_C,
    IMG_H,
    IMG_W,
    PHASH_SHIFT,
    md5_chain_payload,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "data",
    "png_corpus",
)
DOC_IDS = (0, 3, 6, 9)


def payload(doc_id: int) -> np.ndarray:
    return md5_chain_payload(doc_id, "image")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    codec = PngCodec()
    for doc_id in DOC_IDS:
        base = payload(doc_id)
        twin = np.minimum(base.astype(np.int64) + PHASH_SHIFT, 255).astype(
            np.uint8
        )
        for offset, pixels in ((0, base), (1, twin)):
            img_id = doc_id * 2 + offset
            png = codec.encode(
                pixels, IMG_W, IMG_H, IMG_C, filter_type=img_id % 5
            )
            with open(os.path.join(OUT, f"{img_id}.png"), "wb") as f:
                f.write(png)
            print(f"{img_id}.png filter={img_id % 5} {len(png)} bytes")


if __name__ == "__main__":
    main()
