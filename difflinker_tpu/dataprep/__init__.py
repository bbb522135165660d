"""Offline dataset-preparation pipelines (L1 of the reference layer map).

Ports of the reference's 12 data/* scripts (SURVEY.md §2.6): ZINC/CASF
DeLinker-triple preparation, conformer generation, GEOM multi-fragment
generation and splits, and Binding MOAD pocket extraction. All heavy lifting
is host-side CPU chemistry; RDKit-bound steps are import-gated, pure
graph/array logic lives in dataprep.graphs (tested without RDKit).
"""
