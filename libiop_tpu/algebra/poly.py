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
    # a is a HOST int, so its power tables are host-computed; both the
    # remainder and the quotient then collapse to O(1)-graph batched ops
    # (one mul + lazy-limb sums) instead of nb-step Python loops — the
    # unrolled recurrences made the witness-encode graph O(d/h) ops and
    # dominated XLA compile time (238k-line MLIR at 2^10).
    #   Q_t = B_{t+1} + a Q_{t+1}  =>  Q_t = a^{-t-1} * S_{t+1},
    #   S_t := sum_{s>=t} a^s B_s;  remainder = S_0.
    a_pows = [1] * nb
    for j in range(1, nb):
        a_pows[j] = F.mul_ints(a_pows[j - 1], a)
    apow_col = jnp.asarray(F.from_ints_np(a_pows)).reshape(F.L, nb, 1)
    weighted = F.mul(blocks, apow_col)                 # C_j = a^j B_j
    # suffix sums over j with lazy 16-bit limbs: canonical limbs < 2^16, so
    # chunks of <= 2^11 terms keep columns < 2^27 (mont_reduce_wide's cap);
    # a second pass combines the <= nb/2^11 chunk carries.
    c = min(nb, 1 << 11)
    nc = -(-nb // c)
    # the second (chunk-carry) cumsum accumulates up to nc 16-bit limbs per
    # column; mont_reduce_wide caps columns at 2^28 => nc <= 2^12 (nb <= 2^23)
    assert nc <= 1 << 12, f"divide_by_vanishing: degree too large (nb={nb})"
    w = weighted.astype(jnp.uint32)
    if nc * c != nb:
        w = jnp.concatenate(
            [w, jnp.zeros((F.L, nc * c - nb, h), jnp.uint32)], axis=1)
    w = w.reshape(F.L, nc, c, h)
    inner = jnp.flip(jnp.cumsum(jnp.flip(w, axis=2), axis=2,
                                dtype=jnp.uint32), axis=2)
    inner = F.lazy_sum_reduce(inner)                   # (L, nc, c, h) canonical
    if nc > 1:
        totals = inner[:, :, 0, :]                     # per-chunk full sums
        carry = jnp.flip(jnp.cumsum(
            jnp.flip(totals.astype(jnp.uint32), axis=1), axis=1,
            dtype=jnp.uint32), axis=1)                 # suffix incl. own chunk
        # exclusive carry: drop own chunk, zero for the last chunk
        carry = jnp.concatenate(
            [carry[:, 1:, :], jnp.zeros((F.L, 1, h), jnp.uint32)], axis=1)
        carry = F.lazy_sum_reduce(carry)               # (L, nc, h) canonical
        S = F.add(inner, carry[:, :, None, :])
    else:
        S = inner
    S = S.reshape(F.L, nc * c, h)[:, :nb, :]           # S_t for all t
    rem = S[:, 0, :]
    ainv = F.inv_int(a)
    ainv_pows = [ainv] * (nb - 1)
    for t in range(1, nb - 1):
        ainv_pows[t] = F.mul_ints(ainv_pows[t - 1], ainv)
    ainv_col = jnp.asarray(F.from_ints_np(ainv_pows)).reshape(F.L, nb - 1, 1)
    q_blocks = F.mul(S[:, 1:, :], ainv_col)            # (L, nb-1, h)
    quotient = q_blocks.reshape(F.L, (nb - 1) * h)
    return quotient[:, :d - h], rem


# ---------------------------------------------------------------------------
# dense polynomial evaluation (blocked Horner)
# ---------------------------------------------------------------------------
#: degree above which evaluation switches from one plain Horner scan to the
#: blocked sqrt-decomposition (a d-step sequential scan on device cost the
#: Aurora verifier 37 s at 2^18 — round-5 profile)
_HORNER_BLOCK_THRESHOLD = 256


def horner_eval(F: PrimeField, coeffs, x):
    """Evaluate the polynomial with coefficients ``coeffs`` (L, d) at point(s)
    x: (L,) or (L, k).  Returns same shape as x.  Graph size O(1) via scan.

    Large degrees use the two-level decomposition p(x) = sum_s x^{m s}
    q_s(x) with m = ceil(sqrt(d)) chunks evaluated in PARALLEL by one
    m-step scan (vectorized over the S chunks), then combined by an S-step
    Horner in x^m — O(sqrt(d)) sequential device steps instead of O(d).
    Field ops are exact mod p, so the result is bit-identical to the plain
    scan (pinned by tests)."""
    single = x.ndim == 1
    if single:
        x = x[:, None]
    k = x.shape[1]
    d = coeffs.shape[1]
    if d <= _HORNER_BLOCK_THRESHOLD:
        acc = F.zeros((k,))
        rev = jnp.flip(coeffs, axis=1).T  # (d, L)

        def body(acc, c):
            acc = F.add(F.mul(acc, x),
                        jnp.broadcast_to(c[:, None], (F.L, k)).astype(jnp.uint32))
            return acc, None

        acc, _ = jax.lax.scan(body, acc, rev)
        return acc[:, 0] if single else acc
    m = 1 << ((d - 1).bit_length() + 1) // 2        # chunk length ~ sqrt(d)
    S = -(-d // m)
    pad = S * m - d
    if pad:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((F.L, pad), jnp.uint32)], axis=1)
    chunks = coeffs.reshape(F.L, S, m)
    # scan over intra-chunk coefficient index (descending), vectorized over
    # (S chunks, k points): acc_s <- acc_s * x + c_{s, j}
    rev = jnp.flip(chunks, axis=2).transpose(2, 0, 1)   # (m, L, S)
    xb = x[:, None, :]                                  # (L, 1, k)
    acc = F.zeros((S, k))

    def body_chunk(acc, c):
        acc = F.add(F.mul(acc, xb),
                    jnp.broadcast_to(c[:, :, None], (F.L, S, k)).astype(jnp.uint32))
        return acc, None

    acc, _ = jax.lax.scan(body_chunk, acc, rev)         # (L, S, k)
    # combine: S-step Horner in x^m over the chunk values (descending s)
    xm = F.pow_static(x, m)                             # (L, k)
    rev_s = jnp.flip(acc, axis=1).transpose(1, 0, 2)    # (S, L, k)
    total = F.zeros((k,))

    def body_outer(total, q):
        total = F.add(F.mul(total, xm), q)
        return total, None

    total, _ = jax.lax.scan(body_outer, total, rev_s)
    return total[:, 0] if single else total


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
