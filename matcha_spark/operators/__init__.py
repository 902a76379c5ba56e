from .dedup import minhash_lsh_candidates, minhash_signatures, ngram_jaccard_pairs, shingles, simhash
from .joins import asof_join, range_join
from .multimodal import frame_sample, image_features
from .similarity import cosine_topk, l2_norms, lsh_bucketed_topk
from .skew import salted_agg, salted_join
from .text import dedup_exact, fingerprint, lang_id, text_quality, token_count
