"""Download + preprocess public datasets.

TPU twin of `preprocess_public_data.py:24-30`:

    python -m generative_recommenders_tpu.cli.preprocess_public_data \
        --dataset_name ml-1m [--data_root tmp]
"""

from __future__ import annotations

import argparse
import logging

from generative_recommenders_tpu.data.preprocessor import (
    get_common_preprocessors,
)


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument(
        "--dataset_name",
        required=True,
        choices=sorted(get_common_preprocessors().keys()),
    )
    p.add_argument("--data_root", default="tmp")
    args = p.parse_args()
    dp = get_common_preprocessors(args.data_root)[args.dataset_name]
    dp.preprocess_rating()


if __name__ == "__main__":
    main()
