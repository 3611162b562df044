"""Top-k retrieval: candidate index, brute-force MIPS, MoL top-k."""

from generative_recommenders_tpu.indexing.candidate_index import (
    CandidateIndex,
    mips_brute_force_top_k,
)

__all__ = ["CandidateIndex", "mips_brute_force_top_k"]
