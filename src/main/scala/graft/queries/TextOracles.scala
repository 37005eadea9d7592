package graft.queries

/**
 * DuckDB oracle SQL for the text-analysis family beyond the l3 stopword
 * heuristic — assembled from [[TextCurationOracles]] (curation, scrubbing,
 * mixtures, governance) and [[TextLmOracles]] (LM scoring, retrieval,
 * graph analytics, segmentation), split in round 10 for file-size hygiene;
 * every call site keeps addressing `TextOracles.<member>`.
 */
object TextOracles extends TextCurationOracles with TextLmOracles
