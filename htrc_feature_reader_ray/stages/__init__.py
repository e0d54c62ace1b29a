"""Pipeline stages: each is a function ``Dataset -> Dataset`` (or a callable
actor class for ``map_batches``), composable and individually testable."""
