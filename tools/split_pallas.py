"""One-shot splitter: ops/pallas_rollout.py (6.5k LoC monolith) -> per-family
modules around ops/pallas_common.py, with pallas_rollout.py kept as the
import facade so every existing `from .pallas_rollout import X` keeps working.

Run from the repo root: python tools/split_pallas.py
"""
import ast
import builtins
from pathlib import Path

OPS = Path("gym_electric_motor_tpu/ops")
SRC = (OPS / "pallas_rollout.py").read_text().splitlines(keepends=True)


def seg(a, b):  # 1-indexed inclusive
    return "".join(SRC[a - 1:b])


IMPORT_BLOCK = '''
from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

'''

MODULES = {
    "pallas_common.py": (
        '"""Shared machinery for the fused Pallas rollout kernels: the\n'
        'in-kernel PRNG, supply/load/converter env-arg closures, and the\n'
        'reference-generator recurrences (wiener/laplace/const/waveform/\n'
        'switched) every family kernel builds on.  Split out of the former\n'
        'pallas_rollout.py monolith (round 4); see that module for the\n'
        'design overview and reference citations."""\n',
        [(43, 440), (2025, 2548)],
    ),
    "pallas_sync.py": (
        '"""Synchronous-family (PMSM/SynRM) fused kernels: the flagship\n'
        'Finite-CC-PMSM reducing rollout + trajectory recorder\n'
        '(_PmsmCtx), the universal family builder (_sync_family /\n'
        'make_fused_sync_rollout), and the closed-loop FOC\n'
        'controller-in-the-loop kernel."""\n',
        [(441, 903), (2549, 3011), (5152, 5381)],
    ),
    "pallas_dc.py": (
        '"""DC-family fused kernels: PermExDc reducing/recording kernels\n'
        '(_PermExCtx), the Cont-SC Series/Shunt kernel, the universal DC\n'
        'family builder (_dc_family / make_fused_dc_rollout), and the\n'
        'closed-loop speed-cascade-in-the-loop kernel."""\n',
        [(904, 2024), (5382, 5567)],
    ),
    "pallas_induction.py": (
        '"""Squirrel-cage induction (SCIM) fused kernels: the Cont-TC-SCIM\n'
        'reducing kernel and the universal induction family builder\n'
        '(_induction_family / make_fused_induction_rollout)."""\n',
        [(3012, 3634)],
    ),
    "pallas_eesm.py": (
        '"""Externally-excited synchronous (EESM) fused kernels: the\n'
        'Finite-CC-EESM reducing kernel and the universal EESM family\n'
        'builder (_eesm_family / make_fused_eesm_family_rollout)."""\n',
        [(3635, 4376)],
    ),
    "pallas_dfim.py": (
        '"""Doubly-fed induction (DFIM) fused kernels: the Cont-CC-DFIM\n'
        'reducing kernel and the universal DFIM family builder\n'
        '(_dfim_family / make_fused_dfim_family_rollout)."""\n',
        [(4377, 5151)],
    ),
    "pallas_policy.py": (
        '"""Policy-in-the-loop fused kernels: the in-kernel actor MLP\n'
        '(reducing evaluation, trajectory recording for fused-collection\n'
        'PPO, in-kernel REINFORCE training)."""\n',
        [(5568, 6359)],
    ),
}

FACADE_DOC = SRC[0:30]  # original module docstring, kept on the facade
DISPATCH = seg(6360, 6478)


def toplevel_names(tree):
    names = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.append(node.target.id)
    return names


def bound_anywhere(tree):
    bound = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, (ast.Store, ast.Del)):
            bound.add(node.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef, ast.Lambda)):
            if not isinstance(node, ast.Lambda):
                bound.add(node.name)
            if not isinstance(node, ast.ClassDef):
                a = node.args
                for arg in (a.posonlyargs + a.args + a.kwonlyargs
                            + ([a.vararg] if a.vararg else [])
                            + ([a.kwarg] if a.kwarg else [])):
                    bound.add(arg.arg)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for al in node.names:
                bound.add((al.asname or al.name).split(".")[0])
        elif isinstance(node, ast.ExceptHandler) and node.name:
            bound.add(node.name)
    return bound


def used_loads(tree):
    return {n.id for n in ast.walk(tree)
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)}


# ---- pass 1: write bodies, collect each module's top-level names
bodies, provides = {}, {}
for fname, (doc, ranges) in MODULES.items():
    body = "".join(seg(a, b) for a, b in ranges)
    bodies[fname] = body
    provides[fname] = toplevel_names(ast.parse(body))

order = ["pallas_common.py", "pallas_sync.py", "pallas_dc.py",
         "pallas_induction.py", "pallas_eesm.py", "pallas_dfim.py",
         "pallas_policy.py"]
owner = {}
for fname in order:
    for n in provides[fname]:
        owner.setdefault(n, fname)

BUILTINS = set(dir(builtins))

# ---- pass 2: compute cross-module imports per module
final = {}
for fname in order:
    tree = ast.parse(IMPORT_BLOCK + bodies[fname])
    missing = used_loads(tree) - bound_anywhere(tree) - BUILTINS
    ext = {}
    for n in sorted(missing):
        src = owner.get(n)
        if src is None or src == fname:
            raise SystemExit(f"{fname}: unresolved name {n!r}")
        ext.setdefault(src, []).append(n)
    imports = ""
    for src in order:
        if src in ext:
            mod = src[:-3]
            names = ", ".join(ext[src])
            line = f"from .{mod} import {names}\n"
            if len(line) > 79:
                line = (f"from .{mod} import (\n    "
                        + ",\n    ".join(ext[src]) + ",\n)\n")
            imports += line
    final[fname] = MODULES[fname][0] + IMPORT_BLOCK + imports + "\n\n" + bodies[fname]

# ---- facade: re-export every top-level name from every module + dispatch
reexports = ""
for fname in order:
    mod = fname[:-3]
    names = sorted(set(provides[fname]))
    reexports += (f"from .{mod} import (  # noqa: F401\n    "
                  + ",\n    ".join(names) + ",\n)\n")
facade = ("".join(FACADE_DOC)
          + "\nfrom __future__ import annotations\n\n"
          + "import jax\nimport jax.numpy as jnp\nimport numpy as np\n\n"
          + reexports + "\n\n" + DISPATCH)

# facade dispatch may need names not in reexports (it uses LANE etc. — all
# re-exported above).  Sanity-check:
ftree = ast.parse(facade)
fmiss = used_loads(ftree) - bound_anywhere(ftree) - BUILTINS
if fmiss:
    raise SystemExit(f"facade unresolved: {sorted(fmiss)}")

for fname, text in final.items():
    compile(text, fname, "exec")
    (OPS / fname).write_text(text)
compile(facade, "pallas_rollout.py", "exec")
(OPS / "pallas_rollout.py").write_text(facade)
print("wrote", ", ".join(order), "and facade;",
      {f: len(final[f].splitlines()) for f in order},
      "facade", len(facade.splitlines()))
