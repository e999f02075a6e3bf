"""Pipeline: reference-compatible API + run driver + output contract."""

from .api import (
    DectResult,
    effective_water_mu,
    get_basismat_sinos,
    get_recon,
    get_sino,
    load_spectrum,
    simulate_dect,
)
from .dualsource import simulate_dualsource_dect
from .gated import gate_weights, gated_fbp_recon, gated_series, view_phases
from .realism import (Stage, apply_chain, correct_chain,
                      simulate_dect_realistic)
from .kvswitch import simulate_kvswitch_dect
from .spectralct import (SpectralResult, make_jitted_pcd_cone_step,
                         make_jitted_pcd_step, pack_pcd_spectral,
                         pack_pcd_spectral_cone, simulate_pcd_spectral,
                         simulate_pcd_spectral_cone)
from .tcm import auto_tcm_profile, simulate_tcm_dect
from .runner import DEFAULT_SPEC_PAIRS, run_config, run_parameter_file

__all__ = [
    "simulate_kvswitch_dect",
    "simulate_dualsource_dect",
    "gated_fbp_recon",
    "gated_series",
    "gate_weights",
    "view_phases",
    "Stage",
    "apply_chain",
    "correct_chain",
    "simulate_dect_realistic",
    "SpectralResult",
    "simulate_pcd_spectral",
    "simulate_pcd_spectral_cone",
    "pack_pcd_spectral",
    "pack_pcd_spectral_cone",
    "make_jitted_pcd_step",
    "make_jitted_pcd_cone_step",
    "auto_tcm_profile",
    "simulate_tcm_dect",
    "get_sino",
    "get_recon",
    "get_basismat_sinos",
    "load_spectrum",
    "simulate_dect",
    "effective_water_mu",
    "DectResult",
    "run_config",
    "run_parameter_file",
    "DEFAULT_SPEC_PAIRS",
]
