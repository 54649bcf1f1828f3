"""Pipeline algebra: ``*`` composition, ``+`` branching, shared-prefix
execution, error-as-value semantics — and a Spark bridge that runs a
whole PipeComplex inside ONE Arrow-batched stage.

Semantics re-derived from the reference's operator algebra
(reference protosc/pipeline.py:7-69,147-206 and
protosc/pipe_complex.py:7-171):

* element ``*`` element -> Pipe (flattens nested pipes);
  anything ``+`` anything -> PipeComplex of parallel branches.
* An element's ``name`` mangles every non-default constructor
  parameter (``Crop_add_perc10``) so two differently-parameterized
  instances never unify; a branch is named after its LAST element,
  duplicates get ``_2``/``_3`` suffixes (protosc/pipe_complex.py:95-107).
* ``PipeComplex.run(package)`` executes branches with SHARED PREFIXES:
  at each depth, distinct elements (by name) run once and the result
  fans out to every branch that starts with them
  (protosc/pipe_complex.py:136-171). This is plan-time CSE expressed
  at run time — the Spark bridge keeps the property because the whole
  complex runs per-row inside one UDF, so the prefix result is one
  local variable, not a recomputed column.
* A raising element returns the exception AS THE PACKAGE, tagged with
  ``.source = element.name``; downstream elements skip it
  (protosc/pipeline.py:27-31, protosc/pipe_complex.py:162-169).
  The Spark bridge maps this to (null feature array, error struct
  sidecar) — errors are data, never task failures, so one corrupt
  sample can't kill a 10^12-row job.
"""

from __future__ import annotations

import inspect
from collections import Counter
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)


class PipeElement:
    """One per-sample operator; subclasses implement ``_apply``."""

    def _apply(self, package):
        raise NotImplementedError

    def apply(self, package):
        return self._apply(package)

    @property
    def default_param(self) -> dict:
        out: dict = {}
        for klass in type(self).__mro__:
            if klass in (PipeElement, object):
                continue
            for p in inspect.signature(klass.__init__).parameters.values():
                if p.default is not inspect.Parameter.empty:
                    out.setdefault(p.name, p.default)
        return out

    @property
    def param(self) -> dict:
        return {k: getattr(self, k) for k in self.default_param}

    @property
    def name(self) -> str:
        base = type(self).__name__
        for key, default in self.default_param.items():
            if getattr(self, key) != default:
                base += f"_{key}{getattr(self, key)}"
        return base

    def __mul__(self, other):
        if isinstance(other, (PipeElement, Pipe)):
            return Pipe(self, other)
        return NotImplemented

    def __add__(self, other):
        if isinstance(other, (PipeElement, Pipe, PipeComplex)):
            return PipeComplex(self) + other
        return NotImplemented


class Pipe:
    """Sequential chain; construction flattens nested pipes."""

    def __init__(self, *parts):
        self.elements: list[PipeElement] = []
        for p in parts:
            if isinstance(p, PipeElement):
                self.elements.append(p)
            elif isinstance(p, Pipe):
                self.elements.extend(p.elements)
            else:
                raise TypeError(f"cannot chain {type(p)}")

    def __len__(self):
        return len(self.elements)

    def __getitem__(self, i):
        return self.elements[i]

    @property
    def name(self) -> str:
        return self.elements[-1].name

    def __mul__(self, other):
        if isinstance(other, (PipeElement, Pipe)):
            return Pipe(self, other)
        return NotImplemented

    def __add__(self, other):
        if isinstance(other, (PipeElement, Pipe, PipeComplex)):
            return PipeComplex(self) + other
        return NotImplemented

    def run(self, package):
        for el in self.elements:
            if isinstance(package, BaseException):
                return package
            try:
                package = el.apply(package)
            except BaseException as e:  # error-as-value
                e.source = el.name
                return e
        return package


class PipeComplex:
    """Named parallel branches with shared-prefix execution."""

    def __init__(self, *branches):
        self.branches: dict[str, Pipe] = {}
        self._counts: Counter = Counter()
        for b in branches:
            self._add(b)

    def _add(self, b) -> None:
        if isinstance(b, PipeElement):
            b = Pipe(b)
        if isinstance(b, PipeComplex):
            for pipe in b.branches.values():
                self._add(pipe)
            return
        n = self._counts[b.name]
        self.branches[b.name if n == 0 else f"{b.name}_{n + 1}"] = b
        self._counts[b.name] += 1

    def __add__(self, other):
        if isinstance(other, (PipeElement, Pipe, PipeComplex)):
            return PipeComplex(*self.branches.values(), other)
        return NotImplemented

    def __mul__(self, other):
        """Distribute a suffix over every branch."""
        if isinstance(other, (PipeElement, Pipe)):
            return PipeComplex(
                *[Pipe(p, other) for p in self.branches.values()]
            )
        return NotImplemented

    def __rmul__(self, other):
        if isinstance(other, (PipeElement, Pipe)):
            return PipeComplex(
                *[Pipe(other, p) for p in self.branches.values()]
            )
        return NotImplemented

    @property
    def settings(self) -> dict:
        """Hierarchical parameter tree {branch: {element: {param:
        value}}} — the plain-dict analog of the reference's
        dot-navigable Settings (protosc/utils.py:43-109,
        protosc/settings.py:11-17)."""
        return {
            bname: {el.name: dict(el.param) for el in pipe.elements}
            for bname, pipe in self.branches.items()
        }

    def push_settings(self, overrides: dict) -> None:
        """Write parameter overrides onto elements before execution
        (reference protosc/pipe_complex.py:124-131 does this via
        setattr per branch). NOTE the reference quirk is preserved:
        elements are SHARED between branches when prefixes unify, so an
        override addressed to one branch reaches every branch sharing
        that element instance."""
        for bname, elems in overrides.items():
            pipe = self.branches[bname]
            for el in pipe.elements:
                for key, val in elems.get(el.name, {}).items():
                    if key not in el.default_param:
                        raise KeyError(f"{el.name} has no parameter {key!r}")
                    setattr(el, key, val)

    def run(self, package, settings: dict | None = None) -> dict:
        """{branch name: output-or-exception}; shared prefixes (matched
        by element name) execute ONCE per package."""
        if settings:
            self.push_settings(settings)
        return self._run(package, self.branches, 0)

    @classmethod
    def _run(cls, package, branches: dict[str, Pipe], depth: int) -> dict:
        out: dict = {}
        live: dict[str, Pipe] = {}
        for bname, pipe in branches.items():
            if len(pipe) == depth:
                out[bname] = package
            else:
                live[bname] = pipe
        groups: dict[str, tuple[PipeElement, dict]] = {}
        for bname, pipe in live.items():
            el = pipe[depth]
            groups.setdefault(el.name, (el, {}))[1][bname] = pipe
        for el, members in groups.values():
            if isinstance(package, BaseException):
                nxt = package
            else:
                try:
                    nxt = el.apply(package)
                except BaseException as e:
                    e.source = el.name
                    nxt = e
            out.update(cls._run(nxt, members, depth + 1))
        return out


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------

ERROR_TYPE = ArrayType(
    StructType(
        [
            StructField("branch", StringType()),
            StructField("stage", StringType()),
            StructField("message", StringType()),
        ]
    )
)


def apply_complex(
    df: DataFrame,
    pc: PipeComplex,
    widths: dict[str, int],
    decode,
    key_cols: list[str],
) -> DataFrame:
    """Run ``pc`` per row in one mapInPandas pass.

    ``decode(row) -> package`` builds the input package from a pandas
    row (e.g. pixels -> ndarray). Output: key_cols + one
    ``array<double>`` column per branch (null on error) + ``errors``
    sidecar listing (branch, stage, message) — the reference's
    exception-as-package behavior made schema-visible.
    """
    branch_names = list(pc.branches)
    assert set(widths) == set(branch_names)
    schema = StructType(
        [df.schema[k] for k in key_cols]
        + [StructField(b, ArrayType(DoubleType())) for b in branch_names]
        + [StructField("errors", ERROR_TYPE)]
    )

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            # plain dicts from one C-level conversion, not iterrows
            # (pc.run is inherently per-package — reference pipeline
            # semantics — but the batch iteration stays cheap)
            for row in pdf.to_dict("records"):
                rec = {k: row[k] for k in key_cols}
                res = pc.run(decode(row))
                errs = []
                for b in branch_names:
                    v = res[b]
                    if isinstance(v, BaseException):
                        rec[b] = None
                        errs.append(
                            {
                                "branch": b,
                                "stage": getattr(v, "source", "?"),
                                "message": str(v),
                            }
                        )
                    else:
                        vec = np.asarray(v, dtype=np.float64).reshape(-1)
                        assert len(vec) == widths[b], (b, len(vec))
                        rec[b] = vec
                rec["errors"] = errs
                rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(_mapper, schema=schema)


def assemble_features(
    df: DataFrame, branch_names: list[str], out_col: str = "features"
) -> DataFrame:
    """Concat branch arrays into one vector; rows with any error keep a
    null vector (selection/statistics must see clean samples only)."""
    return df.withColumn(
        out_col,
        F.when(
            F.size("errors") == 0, F.concat(*[F.col(b) for b in branch_names])
        ),
    )
