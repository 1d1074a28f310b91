"""Table layer: golden reference artifacts, synthetic transcript generator,
checkpoint/lineage manifest."""
