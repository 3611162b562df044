"""Serving: M-FALCON KV-cache scoring, model family (int8 sparse/dense),
C++ load-generator bindings, data producers, MLPerf-style harness."""
