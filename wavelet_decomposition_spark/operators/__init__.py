"""Spark DataFrame operators — the engine's public operator surface.

Each module documents which reference operation it re-expresses
(SURVEY.md §2 inventory numbers) and the Spark primitive chosen.
"""
