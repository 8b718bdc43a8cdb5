"""Multi-chip sharding: corpus-sharded build and search over a device mesh."""
