"""Entry/CLI layer (TPU twins of `main.py`, `preprocess_public_data.py`,
`run_fractal_expansion.py`, `dlrm_v3/train/train_ranker.py`)."""
