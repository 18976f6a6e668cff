"""Eisenstein & Hu (1998) transfer functions, pure JAX.

The self-contained, differentiable "Boltzmann-lite" backend replacing the
reference's CLASS/CAMB dependency (via cosmoprimo): full baryon+CDM transfer
with BAO wiggles (astro-ph/9709112 eqs. 2-24) and the zero-baryon no-wiggle
form (eqs. 26-31). Accuracy vs a full Boltzmann code is the documented ~1-2%
in the transfer shape, which is adequate for template-based (BAO/ShapeFit)
fits where the fiducial pk is only a template; production users can inject
tabulated Boltzmann pk instead (see cosmology.linear.TabulatedLinearPower).

All inputs: k in h/Mpc; internal EH scales in 1/Mpc.
"""

import jax.numpy as jnp

from . import background as bg


def _params_eh(p):
    """Common EH98 intermediate scales (differentiable scalars)."""
    h = p['h']
    om = bg.omega_cb(p)     # EH98 'omega_m h^2' (cdm+b; neutrinos excluded)
    ob = p['omega_b']
    theta = p['T_cmb'] / 2.7
    theta2 = theta * theta
    theta4 = theta2 * theta2

    z_eq = 2.50e4 * om / theta4
    k_eq = 7.46e-2 * om / theta2  # Mpc^-1

    b1 = 0.313 * om ** -0.419 * (1. + 0.607 * om ** 0.674)
    b2 = 0.238 * om ** 0.223
    z_d = 1291. * om ** 0.251 / (1. + 0.659 * om ** 0.828) * (1. + b1 * ob ** b2)

    R_d = 31.5 * ob / theta4 * (1e3 / z_d)
    R_eq = 31.5 * ob / theta4 * (1e3 / z_eq)

    s = 2. / (3. * k_eq) * jnp.sqrt(6. / R_eq) * jnp.log(
        (jnp.sqrt(1. + R_d) + jnp.sqrt(R_d + R_eq)) / (1. + jnp.sqrt(R_eq)))

    k_silk = 1.6 * ob ** 0.52 * om ** 0.73 * (1. + (10.4 * om) ** -0.95)

    return dict(h=h, om=om, ob=ob, theta2=theta2, z_eq=z_eq, k_eq=k_eq,
                z_d=z_d, R_d=R_d, R_eq=R_eq, s=s, k_silk=k_silk)


def _T0_tilde(q, alpha, beta):
    """EH98 eqs. 19-20: pressureless CDM fit."""
    e = jnp.e
    C = 14.2 / alpha + 386. / (1. + 69.9 * q ** 1.08)
    L = jnp.log(e + 1.8 * beta * q)
    return L / (L + C * q * q)


def transfer(p, k):
    """Full EH98 transfer T(k) with BAO wiggles; k in h/Mpc."""
    c = _params_eh(p)
    km = jnp.asarray(k) * c['h']  # Mpc^-1
    om, ob = c['om'], c['ob']
    fb = ob / om
    fc = 1. - fb

    q = km / (13.41 * c['k_eq'])
    ks = km * c['s']

    # CDM piece (eqs. 11-12, 17-18)
    a1 = (46.9 * om) ** 0.670 * (1. + (32.1 * om) ** -0.532)
    a2 = (12.0 * om) ** 0.424 * (1. + (45.0 * om) ** -0.582)
    alpha_c = a1 ** (-fb) * a2 ** (-fb ** 3)
    bb1 = 0.944 / (1. + (458. * om) ** -0.708)
    bb2 = (0.395 * om) ** -0.0266
    beta_c = 1. / (1. + bb1 * (fc ** bb2 - 1.))
    f = 1. / (1. + (ks / 5.4) ** 4)
    T_c = f * _T0_tilde(q, 1., beta_c) + (1. - f) * _T0_tilde(q, alpha_c, beta_c)

    # Baryon piece (eqs. 14-15, 21-24)
    y = (1. + c['z_eq']) / (1. + c['z_d'])
    sqrt1y = jnp.sqrt(1. + y)
    G = y * (-6. * sqrt1y + (2. + 3. * y) * jnp.log((sqrt1y + 1.) / (sqrt1y - 1.)))
    alpha_b = 2.07 * c['k_eq'] * c['s'] * (1. + c['R_d']) ** -0.75 * G
    beta_b = 0.5 + fb + (3. - 2. * fb) * jnp.sqrt((17.2 * om) ** 2 + 1.)
    beta_node = 8.41 * om ** 0.435
    s_tilde = c['s'] / (1. + (beta_node / ks) ** 3) ** (1. / 3.)
    x = km * s_tilde
    j0 = jnp.sinc(x / jnp.pi)  # spherical bessel j0(x) = sinc(x/pi) in numpy convention
    T_b = (_T0_tilde(q, 1., 1.) / (1. + (ks / 5.2) ** 2)
           + alpha_b / (1. + (beta_b / ks) ** 3) * jnp.exp(-(km / c['k_silk']) ** 1.4)) * j0

    return fb * T_b + fc * T_c


def transfer_nowiggle(p, k):
    """EH98 zero-baryon (no-wiggle) transfer (eqs. 26, 28-31); k in h/Mpc."""
    c = _params_eh(p)
    km = jnp.asarray(k) * c['h']
    om, ob = c['om'], c['ob']
    fb = ob / om
    # eq. 26: fitted sound horizon (Mpc)
    s = 44.5 * jnp.log(9.83 / om) / jnp.sqrt(1. + 10. * ob ** 0.75)
    # eqs. 30-31
    alpha_g = 1. - 0.328 * jnp.log(431. * om) * fb + 0.38 * jnp.log(22.3 * om) * fb ** 2
    gamma_eff = (om / c['h']) * (alpha_g + (1. - alpha_g) / (1. + (0.43 * km * s) ** 4))
    q = jnp.asarray(k) * c['theta2'] / gamma_eff
    L0 = jnp.log(2. * jnp.e + 1.8 * q)
    C0 = 14.2 + 731. / (1. + 62.5 * q)
    return L0 / (L0 + C0 * q * q)


def sound_horizon_eh(p):
    """EH98 sound horizon s (eq. 6) in Mpc/h (internal consistency scale)."""
    c = _params_eh(p)
    return c['s'] * c['h']
