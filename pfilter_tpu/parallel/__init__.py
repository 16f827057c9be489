"""Device-mesh parallelism: sharded map blocks + distributed GN reduction."""
