"""plans/warehouse.property_graph — RDF -> property-graph export."""

from npm_extraction_server_spark.plans.warehouse import property_graph

T = [
    ("a", "name", '"A"'), ("a", "name", '"A"'),       # dup prop: 1 value
    ("a", "desc", '"d"'),
    ("a", "dep", "b"), ("a", "dep", "c"), ("a", "dep", "b"),  # dup edge
    ("b", "dep", "c"),
    ("b", "rev", '"1"'),
    # "c" is object-only: must still appear as a node
]


def test_nodes_and_edges(spark):
    t = spark.createDataFrame(T, ["subj", "pred", "obj"])
    pg = property_graph(t)
    nodes = {r["id"]: (r["out_deg"], r["in_deg"], r["n_props"])
             for r in pg["nodes"].collect()}
    assert nodes == {
        "a": (2, 0, 2),   # deps to b,c (set); props name+desc (set)
        "b": (1, 1, 1),
        "c": (0, 2, 0),   # object-only node, no properties
    }
    edges = sorted((r["src"], r["rel"], r["dst"])
                   for r in pg["edges"].collect())
    assert edges == [("a", "dep", "b"), ("a", "dep", "c"),
                     ("b", "dep", "c")]
