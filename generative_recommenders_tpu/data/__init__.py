"""Datasets: sasrec_format CSV + synthetic (research), padded KJT-analogue
batches (DLRM-v3), preprocessors, fractal-expansion multi-file loader."""
