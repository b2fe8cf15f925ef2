from tpu_smatcher.automata.ac import ACTables, build_ac
from tpu_smatcher.automata.sh import SHTables, build_sh
from tpu_smatcher.automata.sbom import SBOMTables, build_sbom
from tpu_smatcher.automata.wu import WMTables, build_wm
from tpu_smatcher.automata.sog import SOGTables, build_sog
from tpu_smatcher.automata.verify import VerifyTables, build_verify

__all__ = [
    "ACTables", "build_ac",
    "SHTables", "build_sh",
    "SBOMTables", "build_sbom",
    "WMTables", "build_wm",
    "SOGTables", "build_sog",
    "VerifyTables", "build_verify",
]
