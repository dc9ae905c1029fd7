"""Aggregate the query/oracle matrices from every functions submodule."""

from __future__ import annotations


def all_queries():
    from pdf_spark.functions import (  # noqa: WPS235
        docformats,
        extraction_queries,
        graph,
        multimodal,
        relational,
        similarity,
        textops,
        urlops,
    )

    out = {}
    for mod in (relational, textops, urlops, similarity, multimodal, graph,
                extraction_queries, docformats):
        out.update(mod.QUERIES)
    return out


def all_oracles():
    from pdf_spark.functions import (
        docformats,
        extraction_queries,
        graph,
        multimodal,
        relational,
        similarity,
        textops,
        urlops,
    )

    out = {}
    for mod in (relational, textops, urlops, similarity, multimodal, graph,
                extraction_queries, docformats):
        out.update(mod.ORACLE)
    return out
