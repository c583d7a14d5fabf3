"""Device mesh + sharding rules (data/task axes) and sweep dispatch."""
