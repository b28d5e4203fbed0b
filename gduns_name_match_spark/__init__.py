"""gduns_name_match_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the record-linkage capabilities of muskanlaul99/Gduns-name-match
(serial pandas/sklearn/Oracle, studied at /root/reference) as an idiomatic
Spark pipeline: declarative DataFrame normalization, salted blocking-key
candidate generation, Arrow-batched pairwise scoring, window-argmin
resolution, and iterative-join connected-components clustering.

Nothing here is a port: the reference tells us WHAT to compute (its
normalization rules, its cosine<=0.2 acceptor, its decision cascade, its
parent-chaining semantics); the HOW is Catalyst expressions, equi-joins on
blocking keys, and pandas UDFs.
"""

__version__ = "0.1.0"
