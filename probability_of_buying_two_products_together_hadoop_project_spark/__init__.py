"""crystalball-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of the reference repo
``SanjeevKhatri/probability-of-buying-two-products-together-Hadoop-Project``
(market-basket co-occurrence, "Crystal Ball" relative frequency), rebuilt
Spark-first (DataFrame / SQL / Catalyst / Structured Streaming) and extended
with the relational + LLM-data-pipeline operator surface from SURVEY.md §2.

Nothing in here is a port: the reference's hand-rolled MapReduce physical
tricks (in-mapper combining, order inversion, stripes, custom partitioners)
are all subsumed by Catalyst/Tungsten — see SURVEY.md §4.
"""

__version__ = "0.1.0"
