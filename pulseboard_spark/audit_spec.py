"""Shared audit surface spec — dependency-free on purpose.

Both the Spark operators (operators/integrity.py) and the DuckDB oracle
(oracle/sql.py) derive their table/relation lists from here, so the two
sides cannot drift on what is audited — and the oracle module stays
importable without pyspark (it is a string table an external driver
loads into its own DuckDB build).
"""

#: (table, primary-key column) — every relational table in the contract.
PK_COLUMNS = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]

#: (child table, FK column, parent table, PK column).
FK_RELATIONS = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]
