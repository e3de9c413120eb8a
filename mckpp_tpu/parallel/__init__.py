"""Multi-chip sharding & distribution."""
