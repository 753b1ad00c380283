"""spiders_for_all_spark — a PySpark-native URL-frontier crawl scheduler.

A from-scratch DataFrame/Catalyst-first re-expression of the query and
data-processing capabilities of ``iiicebearrr/spiders-for-all`` (reference,
read-only at /root/reference): a generic URL frontier over snapshot tables of
interleaved text+media span documents, a partitioned bloom URL-seen set,
per-host politeness budgets, robots gating, and a Window-rank priority queue.

Nothing here is a port: the reference is a single-process requests+SQLAlchemy
crawler; this package declares every stage as a Catalyst logical plan and
keeps Python in vectorized Arrow-batched UDFs only (fetch + parse).
"""

__version__ = "0.1.0"
