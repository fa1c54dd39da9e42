"""Meshes, shard_map data-parallel counting, collective merges, multi-host glue."""
