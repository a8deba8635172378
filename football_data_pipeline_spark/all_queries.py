"""Import every operator module for its registration side effects.

``__spark_entry__`` and the tests import this single module to get the
fully-populated registry.
"""

from .sources import analyze, bloomskip, changelog, incremental, mor, partitions, snapshots, zorder  # noqa: F401
from .streaming import media, mediadedup, supersede, windowed  # noqa: F401
from .operators import (  # noqa: F401
    audio,
    audiodedup,
    bpe,
    chunking,
    cdc,
    curation,
    datacard,
    dedup,
    dims,
    drift,
    embedsearch,
    er_queries,
    etl,
    events,
    extraction,
    form,
    graphrank,
    hybrid,
    ivfpq,
    lm,
    mining,
    mixing,
    multimodal,
    ordering,
    paired,
    prep,
    privacy,
    profiling,
    quality,
    redact,
    relational,
    release,
    repetition,
    retrieval,
    rules,
    sampling,
    selection,
    semdedup,
    sessions,
    sketches,
    skew,
    stats,
    substring,
    textstats,
    video,
    timeseries,
    versioning,
    weighted,
    windows,
)

MODULES = [analyze, bloomskip, changelog, incremental, mor, partitions, zorder, windowed, media, mediadedup, supersede, audio, audiodedup, bpe, cdc, chunking, curation, datacard, dedup, dims, drift, embedsearch, er_queries, etl, events, extraction, form, graphrank, hybrid, ivfpq, lm, mining, mixing, multimodal, ordering, paired, prep, privacy, profiling, quality, redact, relational, release, repetition, retrieval, rules, sampling, selection, semdedup, sessions, sketches, skew, stats, substring, textstats, timeseries, versioning, video, weighted, windows]
