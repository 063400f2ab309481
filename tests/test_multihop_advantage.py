"""System-level capability test: graph-based retrieval beats dense-only
retrieval on multi-hop questions — the core HippoRAG claim (reference
README.md:13-25), demonstrated with deterministic mock providers.

Corpus: chains "<A> is linked to <B>." / "<B> is linked to <C>.". A 2-hop
question mentions only A, so dense retrieval finds the first-hop document
but has no lexical/embedding bridge to the second; the knowledge graph
connects them through the shared entity B and PPR carries seed mass
across, lifting the second-hop document into the top ranks.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from hipporag_tpu import BaseConfig, HippoRAG, StandardRAG  # noqa: E402
from hipporag_tpu.evaluation import RetrievalRecall  # noqa: E402

N_CHAINS = 12


def _chain_corpus():
    docs, questions, gold = [], [], []
    for i in range(N_CHAINS):
        a, b, c = f"Alpha{i}", f"Bridge{i}", f"Omega{i}"
        d1 = f"{a} is linked to {b}."
        d2 = f"{b} is linked to {c}."
        docs += [d1, d2]
        questions.append(f"What does {a} eventually reach?")
        gold.append([d1, d2])
    return docs, questions, gold


def _cfg(tmp_path, name):
    return BaseConfig(
        llm_name="mock",
        embedding_model_name="mock",
        save_dir=str(tmp_path / name),
        embedding_dim=128,
        ppr_batch_size=8,
    )


def test_graph_retrieval_beats_dense_on_two_hop(tmp_path):
    docs, questions, gold = _chain_corpus()

    dense = StandardRAG(global_config=_cfg(tmp_path, "dense"))
    dense.index(docs)
    dense_results, dense_overall = dense.retrieve(questions, gold_docs=gold)

    graph = HippoRAG(global_config=_cfg(tmp_path, "graph"))
    graph.index(docs)
    graph_results, graph_overall = graph.retrieve(questions, gold_docs=gold)

    # both gold docs must rank in the top 2 for the graph path far more
    # often than for dense-only retrieval
    assert graph_overall["Recall@2"] > dense_overall["Recall@2"], (
        graph_overall, dense_overall,
    )
    assert graph_overall["Recall@2"] >= 0.9, graph_overall

    # the second-hop document specifically: dense misses it at rank<=2,
    # the graph path finds it through the Bridge entity
    second_hop_hits_graph = 0
    second_hop_hits_dense = 0
    for i, (g, d) in enumerate(zip(graph_results, dense_results)):
        want = gold[i][1]
        second_hop_hits_graph += want in g.docs[:2]
        second_hop_hits_dense += want in d.docs[:2]
    assert second_hop_hits_graph > second_hop_hits_dense
    assert second_hop_hits_graph >= int(0.9 * N_CHAINS)


def test_graph_retrieval_beats_dense_on_three_hop(tmp_path):
    """MuSiQue-style 3-hop composition (reference README.md:13-25 claims
    associativity on MuSiQue's 2-4 hop chains): the question names only
    the chain head, so dense retrieval cannot reach the second and third
    documents, while PPR mass flows A -> B -> C -> D across shared
    entities with damping-decayed but still-ranking weight."""
    docs, questions, gold = [], [], []
    for i in range(N_CHAINS):
        a, b, c, d = f"Alpha{i}", f"Bridge{i}", f"Middle{i}", f"Omega{i}"
        chain = [
            f"{a} is linked to {b}.",
            f"{b} is linked to {c}.",
            f"{c} is linked to {d}.",
        ]
        docs += chain
        questions.append(f"What does {a} eventually reach?")
        gold.append(chain)

    dense = StandardRAG(global_config=_cfg(tmp_path, "dense3"))
    dense.index(docs)
    dense_results, dense_overall = dense.retrieve(questions, gold_docs=gold)

    graph = HippoRAG(global_config=_cfg(tmp_path, "graph3"))
    graph.index(docs)
    graph_results, graph_overall = graph.retrieve(questions, gold_docs=gold)

    assert graph_overall["Recall@5"] > dense_overall["Recall@5"], (
        graph_overall, dense_overall,
    )

    # the first two hops rank 0/1 for every chain; the deep (third-hop)
    # document carries only ~damping^2 of the seed mass, so it competes
    # with the hashing embedder's dense noise — it must still always
    # surface in the top third of the 36-doc corpus, and beat dense
    # (which has no lexical bridge to it at all) decisively at k=5
    deep_hits_graph = 0
    deep_hits_dense = 0
    for i, (g, d) in enumerate(zip(graph_results, dense_results)):
        want = gold[i][2]
        assert want in g.docs[:12], (i, g.docs)
        deep_hits_graph += want in g.docs[:5]
        deep_hits_dense += want in d.docs[:5]
    assert deep_hits_graph > 2 * deep_hits_dense
    assert deep_hits_graph >= int(0.5 * N_CHAINS), (
        deep_hits_graph, deep_hits_dense,
    )
