"""Force engines.

The reference exposes four engines behind one trait (SURVEY.md §2.2):
brute-force O(N^2) (src/manual/brute_force.rs), manual recursive Barnes-Hut
(src/manual/barnes_hut.rs), LLM arena+Morton Barnes-Hut + 3D specialization
(src/llm/barnes_hut.rs), and an incremental "midterm" Barnes-Hut
(src/llm/barnes_hut_midterm.rs).

Here an engine is a named force function ``force(pos, mass_eff, params) ->
acc`` (plus optional auxiliary outputs, e.g. octree node boxes for the
visualizer).  All engines share the step loop in ``core/stepper.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

ENGINES: dict = {}


@dataclass(frozen=True)
class Engine:
    name: str
    #: force(pos[N,D], mass_eff[N], params) -> acc[N,D]
    force: Callable
    #: optional: aux(pos, mass_eff, params) -> dict of arrays for inspection
    #: (e.g. octree node AABBs, the analog of the reference's tree rendering,
    #: src/manual/barnes_hut.rs:316-356)
    aux: Optional[Callable] = None
    description: str = ""
    #: stateful engines (e.g. the incremental tree) carry a cache between
    #: steps: init_carry(pos, mass, params) -> carry and
    #: force_carry(pos, mass, params, carry) -> (acc, carry).
    init_carry: Optional[Callable] = None
    force_carry: Optional[Callable] = None

    @property
    def stateful(self) -> bool:
        return self.force_carry is not None


def register(engine: Engine) -> Engine:
    ENGINES[engine.name] = engine
    return engine


def get_engine(name, **options) -> Engine:
    """Look up an engine by name.  Options (e.g. ``theta``-independent build
    parameters like tree depth or tile sizes) are bound via the factory
    registered under the name."""
    if isinstance(name, Engine):
        return name
    try:
        entry = ENGINES[name]
    except KeyError:
        raise KeyError(f"unknown engine {name!r}; available: {sorted(ENGINES)}") from None
    if callable(entry) and not isinstance(entry, Engine):
        return entry(**options)
    if options:
        raise TypeError(
            f"engine {name!r} takes no build options (got {sorted(options)})"
        )
    return entry


# Import engine modules for their registration side effects.
from nbody_tpu.engines import brute_force as _bf  # noqa: E402,F401
from nbody_tpu.engines import barnes_hut as _bh  # noqa: E402,F401
from nbody_tpu.ops import pairwise as _pw  # noqa: E402,F401  (brute-pallas)
