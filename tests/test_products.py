"""Clinical DE products: VNC, iodine map, electron density, Z_eff."""

import numpy as np
import pytest

from dexct_tpu.analysis.products import (
    WATER_ELECTRON_DENSITY,
    electron_density_map,
    iodine_map,
    vnc_image,
    zeff_image,
)
from dexct_tpu.physics.materials import BONE, Material, WATER


def _basis_images():
    """2x2 toy: [water-only, water+iodine; tissue, empty] in a
    (water, iodine) basis."""
    a_w = np.array([[1.0, 1.0], [1.06, 0.0]])
    a_i = np.array([[0.0, 0.005], [0.0, 0.0]])  # 5 mg/mL in one pixel
    return [a_w, a_i], [WATER, Material("iodine", 4.93, "I(100.0)")]


class TestProducts:
    def test_vnc_removes_iodine(self):
        a, mats = _basis_images()
        vnc = vnc_image(a, mats, 70.0)
        # iodine pixel's VNC equals the plain-water pixel's HU
        np.testing.assert_allclose(vnc[0, 1], vnc[0, 0], atol=1e-9)
        assert abs(vnc[0, 0]) < 1.0  # water ~ 0 HU
        # while a VMI at 70 keV would show strong enhancement
        mu_i = float(mats[1].mass_atten(np.array([70.0]))[0])
        assert 0.005 * mu_i > 0.01  # the removed contrast is real

    def test_iodine_map_units(self):
        a, mats = _basis_images()
        im = iodine_map(a, mats)
        np.testing.assert_allclose(im[0, 1], 5.0)
        assert im[0, 0] == 0.0

    def test_iodine_identification_error(self):
        with pytest.raises(ValueError, match="iodine"):
            iodine_map([np.ones((2, 2))], [WATER])

    def test_electron_density_water_unity(self):
        rho_e = electron_density_map([np.ones((2, 2))], [WATER])
        np.testing.assert_allclose(rho_e, 1.0, rtol=2e-3)

    def test_zeff_known_materials(self):
        # water Z_eff ~ 7.42-7.45 (power-law, m=2.94); cortical bone
        # ~ 13-14
        z_w = zeff_image([np.ones((1, 1))], [WATER])[0, 0]
        assert 7.3 < z_w < 7.6
        z_b = zeff_image([np.ones((1, 1)) * BONE.density], [BONE])[0, 0]
        assert 12.0 < z_b < 14.5
        # air pixel -> 0 (below the electron-density floor)
        z_air = zeff_image([np.zeros((1, 1))], [WATER])[0, 0]
        assert z_air == 0.0

    def test_zeff_mixture_monotone(self):
        # adding bone to water raises Z_eff monotonically
        fracs = np.linspace(0, 1, 5)
        zs = [zeff_image([np.array([[1 - f]]), np.array([[f * 1.92]])],
                         [WATER, BONE])[0, 0] for f in fracs]
        assert all(b > a for a, b in zip(zs, zs[1:]))
