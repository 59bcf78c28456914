# Minimal spark-submit job: crawl a seed list through the real engine and
# print the crawl-order hash + product count (no repo-root imports besides
# the shipped zip).
import json, sys, tempfile
from pyspark.sql import SparkSession

from price_crawler_spark.frontier.wave import CrawlRun
from price_crawler_spark.operators.extraction import extract_products

spark = SparkSession.builder.getOrCreate()
with tempfile.TemporaryDirectory() as root:
    run = CrawlRun(spark, root, queries=["RTX 4090"])
    waves = run.run(max_waves=3)
    order = [r.doc_id for r in run.crawl_order().collect()]
    n_products = extract_products(run.documents()).count()
import hashlib
print(json.dumps({
    "waves": waves,
    "urls_fetched": len(order),
    "order_md5": hashlib.md5("\n".join(order).encode()).hexdigest(),
    "products": n_products,
}))
spark.stop()
