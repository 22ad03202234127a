"""Mesh construction, sharding rules, collectives (SURVEY.md §2.C)."""
