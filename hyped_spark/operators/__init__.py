"""DataFrame -> DataFrame operator stages.

Each stage is a plain function (or a small configured callable) from
DataFrame to DataFrame with schema checkable up front via
``hyped_spark.plans.spec.probe_schema`` — the Spark-native analogue of the
reference's ``map_features`` prepare-time schema propagation
(/root/reference/src/hyped/data/processors/base.py:582-597).
"""

from hyped_spark.operators.lww import (  # noqa: F401
    lww_dedup,
    lww_dedup_agg,
    lww_dedup_salted,
)
from hyped_spark.operators.restructure import (  # noqa: F401
    Const,
    filter_features,
    flatten_features,
    format_features,
)
from hyped_spark.operators.sequence import (  # noqa: F401
    apply_mask,
    chunk_seq,
    extend_seq,
    filter_seq,
    join_str_seq,
)
from hyped_spark.operators.dedup import (  # noqa: F401
    connected_components,
    decontaminate,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from hyped_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_topk,
)
from hyped_spark.operators.joins import asof_join, range_join  # noqa: F401
from hyped_spark.operators.curation import (  # noqa: F401
    pack_offsets,
    source_mixture_weights,
    split_by_hash,
    stratified_sample,
)
from hyped_spark.operators.substrings import (  # noqa: F401
    cut_duplicate_spans,
    duplicate_ngram_spans,
    duplicate_token_frac,
)
