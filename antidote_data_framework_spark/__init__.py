"""antidote_data_framework_spark — a PySpark-native analytics engine.

A from-scratch engine with the capability envelope of
``rastegarpanah/antidote-data-framework`` (the official code release of
Rastegarpanah, Gummadi, Crovella, *"Fighting Fire with Fire: Using
Antidote Data to Improve Polarization and Fairness of Recommender
Systems"*, WSDM 2019, arXiv:1812.01504), re-expressed Spark-first:

- relational / event-time / text / embedding operators as declarative
  DataFrame plans (Catalyst + Tungsten pick the physical strategy);
- the reference's recsys surface (ratings ingestion, ALS matrix
  factorization, polarization + Yao-Huang fairness metrics, antidote
  data generation by projected gradient descent) as MLlib pipelines +
  DataFrame aggregations, with driver-local numpy only for the small
  k x m antidote state;
- LLM-data-pipeline operators (dedup, similarity search, multimodal
  column plumbing, text analysis) designed for 100 TB scale.

Nothing here is a port: the reference is single-node numpy research
code; every operator below is designed around Spark's distributed
execution model (partitioning, shuffles, broadcast, AQE, codegen).
"""

__version__ = "0.1.0"

from .registry import QUERIES, ORACLE_SQL, spark_query  # noqa: F401
