"""North-star LLM-data-pipeline extensions (SURVEY.md §2.12, X1-X5).

`register()` returns extension QueryDefs merged into the main registry.
"""

from __future__ import annotations


def register() -> dict:
    from . import (
        dedup,
        graph,
        multimodal,
        packing,
        sampling,
        similarity,
        text,
    )

    reg: dict = {}
    for mod in (dedup, graph, multimodal, packing, sampling, similarity, text):
        reg.update(mod.register())
    return reg
