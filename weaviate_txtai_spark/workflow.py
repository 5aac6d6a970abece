"""txtai-style named workflows (reference README.md:30-43, api.http:4-24).

The reference serves two YAML-declared workflows over the txtai API:

    workflow:
      index:
        batch: 2500
        tasks: [transform, index-into-backend]
      search:
        tasks: [transform, backend search]

and clients POST ``{"name": "index", "elements": [texts...]}``. Here the
same surface is a thin driver over ``Embeddings``: elements stream
through the task chain in ``batch``-sized slices (the reference's
``batch: 2500`` knob, README.md:32), ids are assigned from the running
offset exactly like ingest, and ``search`` maps each element to its
top-k. The heavy lifting stays in the engine — a workflow is
configuration, not a second execution path.
"""

from __future__ import annotations

from typing import Any, Sequence

from weaviate_txtai_spark.embeddings import Embeddings

DEFAULT_WORKFLOWS = {
    "index": {"batch": 2500, "tasks": ["transform", "index"]},
    "search": {"tasks": ["transform", "search"]},
}


class Workflows:
    """Named element pipelines over an Embeddings instance.

    ``run("index", texts)`` ingests; ``run("search", queries)`` returns
    one result list per query. Custom workflows may chain the actions
    ``nop`` / ``transform`` / ``index`` / ``search`` — unknown actions
    raise immediately (config errors should not fail mid-stream).
    """

    _ACTIONS = {"nop", "transform", "index", "search"}

    def __init__(
        self,
        embeddings: Embeddings,
        workflows: dict[str, dict[str, Any]] | None = None,
    ):
        self.embeddings = embeddings
        self.workflows = workflows or DEFAULT_WORKFLOWS
        for name, wf in self.workflows.items():
            for task in wf.get("tasks", []):
                action = task if isinstance(task, str) else task.get("action")
                actions = action if isinstance(action, list) else [action]
                for a in actions:
                    if a not in self._ACTIONS:
                        raise ValueError(f"workflow {name}: unknown action {a!r}")

    def run(self, name: str, elements: Sequence, limit: int = 3) -> list:
        if name not in self.workflows:
            raise KeyError(f"no workflow named {name!r}")
        wf = self.workflows[name]
        actions: list[str] = []
        for task in wf.get("tasks", []):
            action = task if isinstance(task, str) else task.get("action")
            acts = action if isinstance(action, list) else [action]
            actions.extend(acts)

        batch = int(wf.get("batch", 0)) or len(elements) or 1
        out: list = []
        for lo in range(0, len(elements), batch):
            chunk = list(elements[lo : lo + batch])
            if "index" in actions:
                start = self.embeddings.offset
                self.embeddings.index(
                    [(start + i, t, None) for i, t in enumerate(chunk)]
                ) if start == 0 else self.embeddings.upsert(
                    [(start + i, t, None) for i, t in enumerate(chunk)]
                )
                out.extend(range(start, start + len(chunk)))
            elif "search" in actions:
                out.extend(self.embeddings.batchsearch(chunk, limit))
            else:  # nop/transform only: return vectors (transform chain)
                out.extend(self.embeddings.batchtransform(chunk))
        return out

    __call__ = run
