"""Scale-probe fixture generator: expand an existing SF directory by an
integer factor with referential integrity preserved, so the 100 TB design
claims can be checked EMPIRICALLY (VERDICT r3 item 2: run the slowest keys
at 10x data and measure the scaling exponent instead of arguing it).

Replication scheme (copy 0 is the original; copies 1..factor-1 shift ids):
- fact tables get per-copy key shifts of (max(key)+1), so joins resolve
  within a copy exactly as in the original (customer <- orders <- lineitem,
  supplier <- lineitem);
- dimension tables (region, nation, part) stay fixed, as in TPC-H scaling;
- documents additionally get a per-copy token suffix on EVERY token: this
  keeps each copy's internal near-dup structure bit-identical while giving
  ZERO cross-copy shingle overlap — near-dup density stays constant per
  row, which is the property that makes the 10x timing a clean read of the
  blocking pipeline's exponent (naive replication would make every doc a
  10-way exact dup and quadratically inflate the pair space — a different
  workload, not a bigger one);
- embeddings replicate as-is (vector distributions, hence cell/bucket
  occupancy per row, are what grows — the honest 10x for ANN blocking).

Pure DuckDB (no Spark session needed); ~seconds at sf0.1 x10. Output is a
plain parquet-per-table dir usable as any other sf_dir.
"""

from __future__ import annotations

import hashlib
import os
import sys

_FIXED = ("region", "nation", "part")


def _src_token(src: str) -> str:
    """Fingerprint of the resolved source dir: path + per-file (name, size,
    mtime). Part of the idempotency marker so a probe dir built from a
    DIFFERENT base SF (or a regenerated one) is rebuilt instead of silently
    reused with a stale/mismatched base (ADVICE r4)."""
    h = hashlib.sha256(os.path.realpath(src).encode())
    for name in sorted(os.listdir(src)):
        p = os.path.join(src, name)
        st = os.stat(p)
        h.update(f"{name}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def generate(src: str, dst: str, factor: int = 10) -> str:
    """Materialize ``dst`` as ``factor`` integrity-preserving copies of
    ``src``. Idempotent per (factor, source fingerprint): returns
    immediately iff the marker for THIS source exists; a marker from a
    different source triggers a rebuild."""
    import duckdb

    src = src.rstrip("/")
    marker = os.path.join(dst, f".complete_x{factor}_{_src_token(src)}")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    for stale in os.listdir(dst):  # drop any prior build (different source)
        if stale.startswith(".complete_x"):
            os.unlink(os.path.join(dst, stale))
    con = duckdb.connect()

    def t(name: str) -> str:
        return f"'{src}/{name}.parquet'"

    # Every shifted id family strides by MAX(id)+1 from the actual source
    # (never a hardcoded constant), so copies cannot collide at any base SF
    # (ADVICE r4: fixed 1M/10M strides would alias at sf1+).
    strides = {
        name: con.sql(f"SELECT MAX({key}) + 1 FROM {t(name)}").fetchone()[0]
        for name, key in (
            ("customer", "c_custkey"),
            ("supplier", "s_suppkey"),
            ("orders", "o_orderkey"),
            ("events", "event_id"),
            ("user", "user_id"),  # events.user_id, see below
            ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        )
        if name != "user"
    }
    strides["user"] = con.sql(
        f"SELECT MAX(user_id) + 1 FROM {t('events')}"
    ).fetchone()[0]
    ks = ", ".join(str(k) for k in range(factor))
    copies = f"(SELECT unnest([{ks}]) AS k)"

    for name in _FIXED:
        con.sql(
            f"COPY (SELECT * FROM {t(name)}) TO '{dst}/{name}.parquet'"
        )
    con.sql(f"""
        COPY (SELECT c_custkey + k * {strides['customer']} AS c_custkey,
                     c_name, c_nationkey, c_acctbal, c_mktsegment
              FROM {t('customer')}, {copies})
        TO '{dst}/customer.parquet'""")
    con.sql(f"""
        COPY (SELECT s_suppkey + k * {strides['supplier']} AS s_suppkey,
                     s_name, s_nationkey, s_acctbal
              FROM {t('supplier')}, {copies})
        TO '{dst}/supplier.parquet'""")
    con.sql(f"""
        COPY (SELECT o_orderkey + k * {strides['orders']} AS o_orderkey,
                     o_custkey + k * {strides['customer']} AS o_custkey,
                     o_orderstatus, o_totalprice, o_orderdate,
                     o_orderpriority
              FROM {t('orders')}, {copies})
        TO '{dst}/orders.parquet'""")
    con.sql(f"""
        COPY (SELECT l_orderkey + k * {strides['orders']} AS l_orderkey,
                     l_partkey,
                     l_suppkey + k * {strides['supplier']} AS l_suppkey,
                     l_linenumber, l_quantity, l_extendedprice, l_discount,
                     l_tax, l_returnflag, l_linestatus, l_shipdate
              FROM {t('lineitem')}, {copies})
        TO '{dst}/lineitem.parquet'""")
    con.sql(f"""
        COPY (SELECT event_id + k * {strides['events']} AS event_id, ts,
                     user_id + k * {strides['user']} AS user_id,
                     event_type, value, props
              FROM {t('events')}, {copies})
        TO '{dst}/events.parquet'""")
    # per-copy token suffix: copy 0 keeps the original text verbatim
    con.sql(f"""
        COPY (SELECT doc_id + k * {strides['documents']} AS doc_id,
                     CASE WHEN k = 0 THEN text
                          ELSE regexp_replace(text, '(\\S+)',
                                              '\\1x' || k, 'g') END AS text,
                     lang, source,
                     CAST(CASE WHEN k = 0 THEN n_chars
                          ELSE len(regexp_replace(text, '(\\S+)',
                                   '\\1x' || k, 'g')) END AS BIGINT)
                         AS n_chars
              FROM {t('documents')}, {copies})
        TO '{dst}/documents.parquet'""")
    con.sql(f"""
        COPY (SELECT vec_id + k * {strides['embeddings']} AS vec_id, embedding, label
              FROM {t('embeddings')}, {copies})
        TO '{dst}/embeddings.parquet'""")
    con.close()
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaleprobe/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(generate(src, dst, factor))
