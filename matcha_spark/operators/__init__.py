from .dedup import (
    connected_components,
    dedup_near_docs,
    dedup_near_docs_keep_best,
    dedup_near_docs_lsh,
    duplicate_spans,
    jaccard_verify,
    keep_best_map,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    scrub_duplicate_spans,
    shingles,
    simhash,
    simhash_candidates,
)
from .joins import asof_join, range_join
from .multimodal import frame_sample, image_features
from .graph import predicate_closure, transitive_closure
from .similarity import (
    cosine_topk,
    ivf_topk,
    ivfpq_topk,
    l2_norms,
    lsh_bucketed_topk,
    pq_topk,
)
from .skew import salted_agg, salted_join
from .text import (
    dedup_exact,
    fingerprint,
    lang_id,
    text_quality,
    token_count,
    winnow_fingerprints,
    winnow_shared_docs,
)
from .demux import mp4_frame_slicer, parse_mp4_samples
