"""Connected-components resume from warehouse checkpoint."""

from __future__ import annotations

import networkx as nx
import pytest

from cuttana_spark.analytics.components import connected_components
from cuttana_spark.analytics.supersteps import SuperstepRunner
from cuttana_spark.plans.warehouse import Warehouse


def test_cc_resume_exact(spark, tmp_path):
    G = nx.Graph()
    for off in (0, 500):
        H = nx.barabasi_albert_graph(80, 2, seed=off + 9)
        G.add_edges_from((u + off, v + off) for u, v in H.edges())
    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in G.edges()], "src long, dst long"
    ).cache()

    base = {r.vertex: r.component for r in connected_components(spark, df).collect()}

    wh = Warehouse(str(tmp_path / "wh"))
    r1 = SuperstepRunner(spark, wh, "cc", interval=1, fail_after=2)
    with pytest.raises(RuntimeError, match="injected failure"):
        connected_components(spark, df, runner=r1)
    assert wh.latest("cc_state").meta["superstep"] == 2

    r2 = SuperstepRunner(spark, wh, "cc", interval=1)
    resumed = {
        r.vertex: r.component
        for r in connected_components(spark, df, runner=r2).collect()
    }
    assert resumed == base  # component labels are exact (integer min-ids)
    for comp in nx.connected_components(G):
        rep = min(comp)
        for v in comp:
            assert resumed[v] == rep
