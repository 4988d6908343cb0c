"""Polynomial toolkit: vanishing polynomials, Horner evaluation, Lagrange
coefficients — multiplicative-coset instantiations.

Counterparts (semantics, not code) of:
* libiop/algebra/polynomials/vanishing_polynomial.{hpp,tcc}: for a coset H of
  order h with shift s, Z_H(x) = x^h - s^h; O(log h) point evaluation; its
  evaluations over another coset L have only |L|/gcd(|L|,h) distinct values
  (the |H|-to-1 map structure), which we exploit by computing the short cycle
  and tiling — O(N/h) field ops instead of O(N).
* libiop/algebra/lagrange.{hpp,tcc}: Lagrange coefficients of a domain at a
  point via the derivative formula, batch-inverted with Fermat.
"""
from __future__ import annotations

from math import gcd

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.prime import PrimeField
from .domains import MultiplicativeCoset, device_powers


# ---------------------------------------------------------------------------
# vanishing polynomial of a multiplicative coset: Z_H(x) = x^h - s^h
# ---------------------------------------------------------------------------
def vanishing_eval_at_point(H: MultiplicativeCoset, x):
    """Z_H at a device point batch x (L, *batch)."""
    F = H.field
    xh = F.pow_static(x, H.order)
    sh = F.from_ints([pow(H.shift, H.order, F.p)]).reshape(
        (F.L,) + (1,) * (x.ndim - 1))
    return F.sub(xh, jnp.broadcast_to(sh, xh.shape).astype(jnp.uint32))


def vanishing_evals_over(H: MultiplicativeCoset, L: MultiplicativeCoset):
    """(L_limbs, |L|) evaluations of Z_H over domain L, natural order.

    Uses periodicity: Z_H(shift_L * g_L^k) = shift_L^h * (g_L^h)^k - s^h,
    and g_L^h has order |L|/gcd(|L|,h): compute the short cycle, tile."""
    F = H.field
    h = H.order
    N = L.order
    distinct = N // gcd(N, h)
    w = pow(L.g, h, F.p)                       # generator of the short cycle
    w_l = F.from_ints([w]).reshape(F.L)
    cycle = device_powers(F, w_l, max(distinct, 1))   # (L, distinct)
    scale = F.from_ints([pow(L.shift, h, F.p)]).reshape(F.L, 1)
    sh = F.from_ints([pow(H.shift, h, F.p)]).reshape(F.L, 1)
    vals = F.sub(F.mul(cycle, scale), jnp.broadcast_to(sh, (F.L, distinct)).astype(jnp.uint32))
    if distinct < N:
        vals = jnp.tile(vals, (1, N // distinct))
    return vals


def vanishing_inverse_evals_over(H: MultiplicativeCoset, L: MultiplicativeCoset):
    """1/Z_H over L (L must be disjoint from H so Z_H never vanishes).
    Inverts only the short cycle — O((N/h)·log p) instead of O(N·log p)."""
    F = H.field
    h = H.order
    N = L.order
    distinct = N // gcd(N, h)
    vals = vanishing_evals_over(H, L)[:, :distinct]
    inv = F.inv(vals)
    if distinct < N:
        inv = jnp.tile(inv, (1, N // distinct))
    return inv


def vanishing_formal_derivative_at_point(H: MultiplicativeCoset, x):
    """Z_H'(x) = h * x^(h-1) (device point batch)."""
    F = H.field
    hx = F.pow_static(x, H.order - 1)
    h_l = F.from_ints([H.order % F.p]).reshape((F.L,) + (1,) * (x.ndim - 1))
    return F.mul(hx, h_l)


def vanishing_coeffs_ints(H: MultiplicativeCoset):
    """Host: coefficient list (canonical ints) of Z_H = x^h - s^h."""
    coeffs = [0] * (H.order + 1)
    coeffs[0] = (-pow(H.shift, H.order, H.field.p)) % H.field.p
    coeffs[H.order] = 1
    return coeffs


def mul_by_vanishing(coeffs, H: MultiplicativeCoset):
    """Coefficients of Z_H * f = (x^h - a) * f for f given by ``coeffs``
    (L, d): returns (L, d + h).  Handles d > h (overlapping bands) correctly."""
    F = H.field
    h = H.order
    d = coeffs.shape[1]
    a = pow(H.shift, h, F.p)
    neg_a = F.from_ints([(F.p - a) % F.p]).reshape(F.L, 1)
    out = jnp.zeros((F.L, d + h), dtype=jnp.uint32)
    out = out.at[:, :d].set(F.mul(coeffs, neg_a))
    out = out.at[:, h:].set(F.add(out[:, h:], coeffs))
    return out


def divide_by_vanishing(coeffs, H: MultiplicativeCoset):
    """Divide the polynomial with coefficient array ``coeffs`` (L, d) by
    Z_H = x^h - a (a = shift^h): returns (quotient, remainder) coefficient
    arrays of widths d-h (>=0) and h.

    Block scheme (role of polynomial_over_vanishing_polynomial,
    vanishing_polynomial.tcc): write f = sum_j B_j(x) x^{jh}; since
    x^{jh} = a^j mod Z_H,  remainder = sum_j a^j B_j  and quotient blocks
    satisfy Q_t = B_{t+1} + a*Q_{t+1} (descending scan over d/h blocks —
    a handful of batched muls, no sequential long division)."""
    F = H.field
    h = H.order
    d = coeffs.shape[1]
    if d <= h:
        pad = jnp.zeros((F.L, h - d), dtype=jnp.uint32)
        return jnp.zeros((F.L, 0), dtype=jnp.uint32), jnp.concatenate([coeffs, pad], axis=1)
    nb = -(-d // h)
    if d != nb * h:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((F.L, nb * h - d), dtype=jnp.uint32)], axis=1)
    blocks = coeffs.reshape(F.L, nb, h)
    a = pow(H.shift, h, F.p)
    a_l = F.from_ints([a]).reshape(F.L, 1)
    # remainder = sum_j a^j B_j
    rem = blocks[:, 0, :]
    apow = a_l
    for j in range(1, nb):
        rem = F.add(rem, F.mul(blocks[:, j, :], apow))
        apow = F.mul(apow, a_l)
    # quotient blocks, descending
    q_blocks = [None] * (nb - 1)
    q_blocks[nb - 2] = blocks[:, nb - 1, :]
    for t in range(nb - 3, -1, -1):
        q_blocks[t] = F.add(blocks[:, t + 1, :], F.mul(q_blocks[t + 1], a_l))
    quotient = jnp.concatenate(q_blocks, axis=1)
    return quotient[:, :d - h], rem


# ---------------------------------------------------------------------------
# dense polynomial evaluation (Horner, scan over coefficients)
# ---------------------------------------------------------------------------
def horner_eval(F: PrimeField, coeffs, x):
    """Evaluate the polynomial with coefficients ``coeffs`` (L, d) at point(s)
    x: (L,) or (L, k). Returns same shape as x. Graph size O(1) via scan."""
    single = x.ndim == 1
    if single:
        x = x[:, None]
    k = x.shape[1]
    acc = F.zeros((k,))
    rev = jnp.flip(coeffs, axis=1).T  # (d, L)

    def body(acc, c):
        acc = F.add(F.mul(acc, x), jnp.broadcast_to(c[:, None], (F.L, k)).astype(jnp.uint32))
        return acc, None

    acc, _ = jax.lax.scan(body, acc, rev)
    return acc[:, 0] if single else acc


# ---------------------------------------------------------------------------
# succinct (unnormalized) Lagrange polynomial — heart of holographic lincheck
# (libiop/algebra/polynomials/lagrange_polynomial.{hpp,tcc}):
#   p_alpha(Y) = (Z_H(alpha) - Z_H(Y)) / (alpha - Y)
# ---------------------------------------------------------------------------
def lagrange_poly_evals_over(H: MultiplicativeCoset, alpha: int,
                             L: MultiplicativeCoset):
    """(L_limbs, |L|) evaluations of the unnormalized p_alpha over domain L
    (alpha a host int, assumed outside L)."""
    F = H.field
    z_alpha = pow(alpha, H.order, F.p) - pow(H.shift, H.order, F.p)
    z_alpha_l = F.from_ints([z_alpha % F.p]).reshape(F.L, 1)
    z_over_L = vanishing_evals_over(H, L)
    num = F.sub(jnp.broadcast_to(z_alpha_l, z_over_L.shape).astype(jnp.uint32),
                z_over_L)
    alpha_l = F.from_ints([alpha % F.p]).reshape(F.L, 1)
    denom = F.sub(jnp.broadcast_to(alpha_l, (F.L, L.order)).astype(jnp.uint32),
                  L.elements())
    return F.mul(num, F.inv(denom))


def lagrange_poly_eval_at_point_int(H: MultiplicativeCoset, alpha: int,
                                    x: int) -> int:
    """Host-int p_alpha(x); handles x == alpha via the derivative Z'_H."""
    p = H.field.p
    alpha %= p
    x %= p
    if x == alpha:
        return H.order * pow(alpha, H.order - 1, p) % p
    z_a = (pow(alpha, H.order, p) - pow(H.shift, H.order, p)) % p
    z_x = (pow(x, H.order, p) - pow(H.shift, H.order, p)) % p
    return (z_a - z_x) * pow((alpha - x) % p, p - 2, p) % p


# ---------------------------------------------------------------------------
# Lagrange coefficients of a domain at a point
# ---------------------------------------------------------------------------
def lagrange_coefficients(H: MultiplicativeCoset, alpha):
    """(L, h) array: k-th entry = L_k(alpha), the Lagrange basis of H at alpha.

    L_k(a) = Z_H(a) / (Z_H'(h_k) * (a - h_k)),  Z_H'(h_k) = h*s^{h-1}*g^{-k}.
    Handles alpha inside H exactly (one-hot). Reference: lagrange.tcc role.
    """
    F = H.field
    h = H.order
    elems = H.elements()                                  # (L, h)
    alpha_b = alpha.reshape(F.L, 1)
    diff = F.sub(jnp.broadcast_to(alpha_b, (F.L, h)).astype(jnp.uint32), elems)
    # Z'(h_k) = h * s^{h-1} * g^{-k}
    c = (H.order % F.p) * pow(H.shift, h - 1, F.p) % F.p
    c_l = F.from_ints([c]).reshape(F.L, 1)
    zprime = F.mul(H.inverse_generator_powers(), c_l)     # (L, h)
    denom = F.mul(zprime, diff)
    z_alpha = vanishing_eval_at_point(H, alpha).reshape(F.L, 1)
    coeffs = F.mul(F.inv(denom), jnp.broadcast_to(z_alpha, (F.L, h)).astype(jnp.uint32))
    # exact-membership correction: if alpha == h_k, L_k = 1, others 0
    member = F.eq(jnp.broadcast_to(alpha_b, (F.L, h)).astype(jnp.uint32), elems)  # (h,)
    any_member = jnp.any(member)
    onehot = F.select(member, F.ones((h,)), F.zeros((h,)))
    return jnp.where(any_member, onehot, coeffs)
