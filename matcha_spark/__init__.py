"""matcha_spark — a PySpark-native triples/BGP query engine with the
query surface of Swirrl/matcha, plus Spark-scale data-pipeline
operators (dedup, similarity search, text analysis, streaming).

Quick start::

    from matcha_spark import TriplesDB, select, kw

    friends = [
        (kw("rick"), kw("rdfs/label"), "Rick"),
        (kw("rick"), kw("foaf/knows"), kw("martin")),
        (kw("martin"), kw("rdfs/label"), "Martin"),
    ]
    db = TriplesDB.from_triples(spark, friends)
    select(["?name"], [
        (kw("rick"), kw("foaf/knows"), "?p"),
        ("?p", kw("rdfs/label"), "?name"),
    ], db)
    # → ["Martin"]
"""

from .db import TriplesDB, ensure_db, index_if_necessary, index_triples, merge_dbs
from .errors import InvalidBgpError, InvalidValuesError, MatchaError
from .patterns import (
    Bind,
    Filter,
    Literal,
    Exists,
    Minus,
    NotExists,
    SubSelect,
    ValuesRows,
    Optional,
    Values,
    Var,
    find_vars,
)
from .query import (
    GRAFTER_URI,
    ask,
    build,
    build_1,
    build_df,
    construct,
    construct_1,
    construct_db,
    explain_query,
    select,
    select_1,
    select_agg,
    describe,
    select_df,
)
from .session import get_spark
from .terms import (
    URI,
    Keyword,
    LangString,
    RDFLiteral,
    Unbound,
    kw,
    register_term_codec,
    unregister_term_codec,
)

__version__ = "0.1.0"

__all__ = [
    "TriplesDB",
    "register_term_codec",
    "unregister_term_codec",
    "ensure_db",
    "index_triples",
    "index_if_necessary",
    "merge_dbs",
    "select",
    "select_1",
    "select_agg",
    "select_df",
    "describe",
    "explain_query",
    "ask",
    "construct",
    "construct_1",
    "construct_db",
    "build",
    "build_1",
    "build_df",
    "GRAFTER_URI",
    "Values",
    "Optional",
    "Bind",
    "Filter",
    "NotExists",
    "Exists",
    "Minus",
    "SubSelect",
    "ValuesRows",
    "Var",
    "Literal",
    "find_vars",
    "Keyword",
    "URI",
    "LangString",
    "RDFLiteral",
    "Unbound",
    "kw",
    "MatchaError",
    "InvalidBgpError",
    "InvalidValuesError",
    "get_spark",
]
