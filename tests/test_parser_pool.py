"""Heavy-state parser through the actor-pool path (SURVEY.md T1/M2):
state must build once per ACTOR, never per batch — the only T1 shape
that had no direct test (round-2 verdict item 9)."""

import numpy as np
import pyarrow as pa


class HeavyParser:
    """Stands in for a spaCy/CoreNLP-style parser: a multi-MB model
    payload built in __init__ (once per pool actor), trivial work per
    batch.  Reports each construction to a named counter actor."""

    heavy = True

    def __init__(self):
        import ray

        self._model = np.ones(2_000_000, dtype=np.float64)  # ~16 MB state
        counter = ray.get_actor("heavy_parser_init_counter",
                                namespace="parser_pool_test")
        ray.get(counter.incr.remote())

    def __call__(self, docs_batch: pa.Table) -> pa.Table:
        assert self._model[0] == 1.0
        return pa.table({
            "doc_id": docs_batch.column("doc_id"),
            "n_model_mb": pa.array(
                [self._model.nbytes // 2**20] * docs_batch.num_rows,
                pa.int64()),
        })


def test_heavy_parser_builds_state_once_per_actor(ray_session):
    import ray
    import ray.data as rd

    from snorkel_ray.stages.parser import parse_docs

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def incr(self):
            self.n += 1
            return self.n

        def get(self):
            return self.n

    counter = Counter.options(name="heavy_parser_init_counter",
                              namespace="parser_pool_test").remote()
    try:
        docs = rd.from_items([{"doc_id": i, "text": f"doc {i}"}
                              for i in range(200)]).repartition(8)
        out = parse_docs(docs, HeavyParser(), batch_size=5,
                         concurrency=2).to_pandas()
        assert len(out) == 200
        assert (out["n_model_mb"] > 0).all()
        n_batches = 200 // 5
        n_inits = ray.get(counter.get.remote())
        # one build per pool actor (+1 for the driver-side instance
        # passed to parse_docs), NOT one per batch — the pool may spin
        # 1 or 2 actors depending on how fast the first drains the 40
        # batches, so the invariant is the bound, not the exact count
        assert 2 <= n_inits <= 3, n_inits
        assert n_inits < n_batches // 4
    finally:
        ray.kill(counter)


def test_heavy_parser_with_args_requires_builder(ray_session):
    """A configured heavy parser must not be silently re-instantiated
    with defaults (round-4 review): required ctor args without a
    build_per_actor() raise; providing one ships the config."""
    import pytest
    import ray.data as rd

    from snorkel_ray.stages.parser import RuleParser, parse_docs

    class ConfiguredParser:
        heavy = True

        def __init__(self, model_name):
            self.model_name = model_name
            self.inner = RuleParser()

        def __call__(self, batch):
            return self.inner(batch)

    docs = rd.from_items([{"doc_id": 1, "url": "u", "text": "One. Two.",
                           "meta_json": "{}"}])
    with pytest.raises(TypeError, match="build_per_actor"):
        parse_docs(docs, ConfiguredParser("big-model"))

    class BuildableParser(ConfiguredParser):
        def build_per_actor(self):
            name = self.model_name

            def _build():
                return ConfiguredParser(name)

            return _build()

    # build_per_actor returning a configured instance works
    p = BuildableParser("big-model")
    p.build_per_actor = lambda: ConfiguredParser("big-model")  # recipe
    out = parse_docs(docs, p, concurrency=(1, 1)).to_pandas()
    assert len(out) == 2
