"""Core simulation: constants, geometry, routes, physics, lidar, NPC, env."""
