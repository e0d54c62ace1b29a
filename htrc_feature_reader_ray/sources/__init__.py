"""Dataset sources: the synthetic pages generator (deterministic fixture of
the ``input_hint`` shape) and pruned parquet readers for the test tables."""
