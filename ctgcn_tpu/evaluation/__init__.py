"""Downstream evaluation tasks: link prediction, node/edge classification,
centrality prediction, similarity prediction.

All evaluators consume the exported per-snapshot embedding CSVs (they never
touch the models) and write the reference's result-CSV artifacts, so
comparison tooling works unchanged across frameworks.
"""
