"""sparkkg — PySpark-native knowledge-graph construction engine.

A from-scratch DataFrame/Arrow pipeline with the knowledge-extraction
capabilities of the reference toolkit (CRF+ALBERT NER, relation
extraction, conlleval scoring; see SURVEY.md for the full map), rebuilt
Spark-first:

- ``core``       pure-Python row semantics shared verbatim by the
                 single-node oracle and the Spark UDFs (byte-identity
                 by construction).
- ``fixtures``   deterministic synthetic corpus generator (seed=42).
- ``oracle``     single-node numpy reference pipeline (defines goldens).
- ``operators``  the Spark operators: extract, segment, featurize,
                 detect (encoder+Viterbi mapInPandas), link,
                 canonicalize, triples, dedup, similarity, textstats,
                 conlleval.
- ``pipeline``   end-to-end KG construction DAG with lineage + resume.
"""

__version__ = "0.1.0"
