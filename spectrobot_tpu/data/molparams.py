"""Molecule / isotopologue registry (HITRAN numbering).

Capability parity: the reference (fedef17/SpectRobot, SURVEY.md C1/C7) carries
per-molecule metadata inside its ``Molec``/``IsoMolec`` classes; here it is a
flat host-side registry feeding struct-of-arrays line lists.

Masses are isotopologue masses in atomic mass units (HITRAN tables).
``MOLECULES[mol_id]`` maps the HITRAN molecule number to a :class:`Molecule`.
"""

from dataclasses import dataclass, field
from typing import Dict, Tuple


@dataclass(frozen=True)
class Isotopologue:
    iso_id: int           # HITRAN isotopologue index (1-based)
    mass_amu: float       # isotopologue mass [amu]
    abundance: float      # terrestrial fractional abundance


@dataclass(frozen=True)
class Molecule:
    mol_id: int           # HITRAN molecule number
    name: str
    isotopologues: Dict[int, Isotopologue] = field(default_factory=dict)

    def mass_amu(self, iso_id: int = 1) -> float:
        return self.isotopologues[iso_id].mass_amu


def _mol(mol_id: int, name: str, isos: Tuple[Tuple[int, float, float], ...]) -> Molecule:
    return Molecule(
        mol_id=mol_id,
        name=name,
        isotopologues={i: Isotopologue(i, m, a) for (i, m, a) in isos},
    )


# HITRAN molecule numbering; masses from the HITRAN isotopologue tables.
MOLECULES: Dict[int, Molecule] = {
    m.mol_id: m
    for m in [
        _mol(1, "H2O", ((1, 18.010565, 0.997317),
                        (2, 20.014811, 1.99983e-3),
                        (3, 19.014780, 3.71884e-4),
                        (4, 19.016740, 3.10693e-4))),
        _mol(2, "CO2", ((1, 43.989830, 0.984204),     # 626
                        (2, 44.993185, 1.10574e-2),   # 636
                        (3, 45.994076, 3.94707e-3),   # 628
                        (4, 44.994045, 7.33989e-4),   # 627
                        (5, 46.997431, 4.43446e-5),   # 638
                        (6, 45.997400, 8.24623e-6),   # 637
                        (7, 47.998322, 3.95734e-6),   # 828
                        (8, 46.998291, 1.47180e-6),   # 827
                        (9, 45.998262, 1.36847e-7),   # 727
                        (10, 49.001675, 4.44600e-8),  # 838
                        (11, 48.001646, 1.65354e-8),  # 837 ('A')
                        (12, 47.001618, 1.53750e-9))),  # 737 ('B')
        _mol(3, "O3", ((1, 47.984745, 0.992901),
                       (2, 49.988991, 3.98194e-3),
                       (3, 49.988991, 1.99097e-3))),
        _mol(4, "N2O", ((1, 44.001062, 0.990333),
                        (2, 44.998096, 3.64093e-3),
                        (3, 44.998096, 3.64093e-3),
                        (4, 46.005308, 1.98582e-3))),
        _mol(5, "CO", ((1, 27.994915, 0.986544),
                       (2, 28.998270, 1.10836e-2),
                       (3, 29.999161, 1.97822e-3),
                       (4, 28.999130, 3.67867e-4),
                       (5, 31.002516, 2.22250e-5),
                       (6, 30.002485, 4.13292e-6))),
        _mol(6, "CH4", ((1, 16.031300, 0.988274),
                        (2, 17.034655, 1.11031e-2),
                        (3, 17.037475, 6.15751e-4))),
        _mol(7, "O2", ((1, 31.989830, 0.995262),
                       (2, 33.994076, 3.99141e-3),
                       (3, 32.994045, 7.42235e-4))),
        _mol(22, "N2", ((1, 28.006148, 0.992687),)),
        _mol(23, "HCN", ((1, 27.010899, 0.985114),)),
        _mol(26, "C2H2", ((1, 26.015650, 0.977599),)),
        _mol(27, "C2H6", ((1, 30.046950, 0.976990),)),
    ]
}

NAME_TO_ID: Dict[str, int] = {m.name: m.mol_id for m in MOLECULES.values()}


def molecule_by_name(name: str) -> Molecule:
    return MOLECULES[NAME_TO_ID[name.upper()]]
