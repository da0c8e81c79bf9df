"""State vector layout — static index map of the DAE unknowns.

TPU-native replacement for the reference's `state_indices`
(external.jl:275-365) + `model_variables` (states_definition.jl:1-78).
Instead of a dict of views over a Julia vector, the layout is a hashable,
static object of index ranges into a flat ``(N_tot,)`` array; all slicing is
static so every access lowers to an XLA static-slice and is vmap-transparent.

Ordering contract (must match the reference exactly so state vectors are
interchangeable): differential states first, then algebraic, with the scalar
current ``I`` forced last (outputs.jl:50-57). Within each group, declaration
order is that of `model_variables`:

    differential: c_e(p,s,n), c_s_avg(particle_p,particle_n | p,n),
                  T(a,p,s,n,z)?, film(n)?, SOH()?, Q(p,n)?
    algebraic:    j(p,n), Φ_e(p,s,n), Φ_s(p,n), j_s(n)?, I()

For the default LCO/Fickian/isothermal mesh (N=10 everywhere) this yields the
reference's 301 DAEs: 30+200 differential, 20+30+20+1 algebraic.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Dict, Tuple

import numpy as np

from .config import Discretizations, Numerics

SECTION_ORDER = ("a", "p", "s", "n", "z")


@dataclasses.dataclass(frozen=True)
class StateEntry:
    start: int
    length: int
    var_type: str  # "differential" | "algebraic"
    # ((section_name, offset_within_state, length), ...)
    sections: Tuple[Tuple[str, int, int], ...]

    @property
    def stop(self) -> int:
        return self.start + self.length

    def sl(self, section: str | None = None) -> slice:
        if section is None:
            return slice(self.start, self.stop)
        for name, off, ln in self.sections:
            if name == section:
                return slice(self.start + off, self.start + off + ln)
        raise KeyError(section)


@dataclasses.dataclass(frozen=True)
class StateLayout:
    N: Discretizations
    temperature: bool
    solid_diffusion: str
    aging: str | None
    _entries: Tuple[Tuple[str, StateEntry], ...]
    N_diff: int
    N_alg: int
    N_tot: int
    half_cell: bool = False

    # ---- construction -----------------------------------------------------

    @staticmethod
    def build(N: Discretizations, numerics: Numerics) -> "StateLayout":
        fick = numerics.solid_diffusion == "Fickian"
        sei = numerics.aging == "SEI"
        # half-cell (lithium-foil anode): no porous anode domain — the foil
        # is a boundary of the separator. No c_s_n/j_n/Φ_s_n states; c_e and
        # Φ_e live on (p, s); the foil potential is the ground (Φ_foil ≡ 0).
        # The reference defines Li_metal θ values and a `lithium_foil`
        # marker (params.jl:854-922, structures.jl:24) but never wires them;
        # this is the full working configuration it gestures at.
        hc = numerics.anode == "Li_metal"

        def secs(*pairs):
            # half-cell: anode sections are kept with length 0, so every
            # section slice stays valid and anodic branches vanish naturally
            out, off = [], 0
            for name, ln in pairs:
                if name == "n" and hc:
                    ln = 0
                out.append((name, off, ln))
                off += ln
            return tuple(out), off

        decl = []  # (name, var_type, sections)
        s, ln = secs(("p", N.p), ("s", N.s), ("n", N.n))
        decl.append(("c_e", "differential", s, ln))
        if fick:
            s, ln = secs(("p", N.p * N.r_p), ("n", N.n * N.r_n))
        else:
            s, ln = secs(("p", N.p), ("n", N.n))
        decl.append(("c_s_avg", "differential", s, ln))
        if numerics.temperature:
            s, ln = secs(("a", N.a), ("p", N.p), ("s", N.s), ("n", N.n), ("z", N.z))
            decl.append(("T", "differential", s, ln))
        if sei:
            s, ln = secs(("n", N.n))
            decl.append(("film", "differential", s, ln))
            decl.append(("SOH", "differential", (), 1))
        if numerics.aging == "stress":
            # stress-driven loss of active material: ε_s per electrode CV.
            # The reference names this mode (params.jl:701 `aging = :stress,
            # # unused`) and ships its θ (E, ν, Ω, σ_critical, m_LAM, β_LAM)
            # but adds no states/physics; this is the working model.
            s, ln = secs(("p", N.p), ("n", N.n))
            decl.append(("eps_s", "differential", s, ln))
        if numerics.solid_diffusion == "polynomial":
            s, ln = secs(("p", N.p), ("n", N.n))
            decl.append(("Q", "differential", s, ln))

        s, ln = secs(("p", N.p), ("n", N.n))
        decl.append(("j", "algebraic", s, ln))
        s, ln = secs(("p", N.p), ("s", N.s), ("n", N.n))
        decl.append(("Phi_e", "algebraic", s, ln))
        s, ln = secs(("p", N.p), ("n", N.n))
        decl.append(("Phi_s", "algebraic", s, ln))
        if sei:
            s, ln = secs(("n", N.n))
            decl.append(("j_s", "algebraic", s, ln))
        decl.append(("I", "algebraic", (), 1))

        entries, pos, n_diff = [], 0, 0
        for var_type in ("differential", "algebraic"):
            for name, vt, sections, length in decl:
                if vt != var_type:
                    continue
                entries.append((name, StateEntry(pos, length, vt, sections)))
                pos += length
                if vt == "differential":
                    n_diff += length

        return StateLayout(
            N=N,
            temperature=numerics.temperature,
            solid_diffusion=numerics.solid_diffusion,
            aging=numerics.aging,
            _entries=tuple(entries),
            N_diff=n_diff,
            N_alg=pos - n_diff,
            N_tot=pos,
            half_cell=hc,
        )

    # ---- access -----------------------------------------------------------

    @cached_property
    def entries(self) -> Dict[str, StateEntry]:
        return dict(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self.entries

    def sl(self, name: str, section: str | None = None) -> slice:
        return self.entries[name].sl(section)

    def get(self, y, name: str, section: str | None = None):
        """Slice state `name` (optionally one section) out of a flat vector."""
        return y[..., self.sl(name, section)]

    @cached_property
    def is_differential(self) -> np.ndarray:
        """Boolean id-vector: True for differential rows (reference
        build_cache's `id`, external.jl:72-172)."""
        m = np.zeros(self.N_tot, dtype=bool)
        m[: self.N_diff] = True
        return m

    # surface node indices of c_s within the full state vector
    def c_s_surface_slice(self, electrode: str) -> tuple:
        """Indices of particle-surface concentrations for one electrode.

        Fickian: every r_x-th node (auxiliary...jl:688-695);
        quadratic/polynomial: all nodes (the state is volume-averaged).
        Returns an index expression usable on the flat state vector.
        """
        e = self.entries["c_s_avg"]
        if self.solid_diffusion == "Fickian":
            n_r = getattr(self.N, "r_" + electrode)
            s = e.sl(electrode)
            n_el = (s.stop - s.start) // n_r   # 0 for the half-cell anode
            base = s.start
            return np.arange(1, n_el + 1) * n_r - 1 + base
        return np.arange(e.sl(electrode).start, e.sl(electrode).stop)

    def c_s_surf(self, y, electrode: str):
        idx = self.c_s_surface_slice(electrode)
        return y[..., idx]

    # convenience scalars
    def V(self, y):
        """Cell voltage = Φ_s[first cathode CV] - Φ_s[last anode CV]
        (scalar_residual.jl:86). Half-cell: the lithium foil is the ground
        (Φ_foil ≡ 0), so V = Φ_s[first cathode CV]."""
        ps = self.sl("Phi_s")
        if self.half_cell:
            return y[..., ps.start]
        return y[..., ps.start] - y[..., ps.stop - 1]

    def I(self, y):
        """Applied current in C-rate units (the scalar state)."""
        return y[..., self.sl("I").start]

    def eta_plating(self, y):
        """Plating overpotential at separator-anode interface
        (scalar_residual.jl:92). Half-cell: the foil surface overpotential
        vs Li/Li⁺, η = Φ_foil − Φ_e(foil) = −Φ_e[last separator CV]."""
        if self.half_cell:
            return -y[..., self.sl("Phi_e").stop - 1]
        return (y[..., self.sl("Phi_s", "n").start]
                - y[..., self.sl("Phi_e", "n").start])

    def soc_from_state(self, y, th):
        """SOC estimate from mean anode stoichiometry (scalar_residual.jl:95-102).
        Half-cell: from cathode stoichiometry (the foil has no state of charge)."""
        if self.half_cell:
            c_s_p = self.get(y, "c_s_avg", "p")
            frac = c_s_p.mean(axis=-1) / th["c_max_p"]
            return ((frac - th["theta_min_p"])
                    / (th["theta_max_p"] - th["theta_min_p"]))
        c_s_n = self.get(y, "c_s_avg", "n")
        frac = c_s_n.mean(axis=-1) / th["c_max_n"]
        return (frac - th["theta_min_n"]) / (th["theta_max_n"] - th["theta_min_n"])
