"""Native BLS12-381 math on python ints: the CPU ground truth / witness layer.

Re-creates the capability of the reference's `native.rs` (L1 in SURVEY.md §1):
the Fp/Fp2/Fp6/Fp12 tower, line-function precomputation, Miller loop, final
exponentiation and BLS signature verification. Algorithms follow the same
mathematical decomposition (`native.rs:293-366, 824-918, 1251-1345,
1358-1527`) because the STARK chips witness exactly these intermediates; the
implementation is fresh python over ints.

Representation: Fp = int (canonical, < P381); Fp2 = (c0, c1); Fp6 =
(c0, c1, c2) of Fp2; Fp12 = (c0, c1) of Fp6. Limb conversion (12x u32
little-endian, `native.rs:234-248`) lives in chips/limbs.py.

Frobenius coefficient tables are computed from the tower structure
(xi = 1 + u, v^3 = xi, w^2 = v) instead of being hard-coded; unit tests pin
them against the reference's decimal constants (`native.rs:1050-1222`).
"""

from __future__ import annotations

# field modulus (native.rs:12-14)
P381 = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
# BLS12-381 x-parameter (native.rs:20-22); note |x|, the sign is handled by
# the final conjugate in the Miller loop.
BLS_X = 15132376222941642752
BLS_X_BITS = BLS_X.bit_length()  # 64

# G1 generator (standard; matches native.rs:1490-1491 test data)
G1_GEN = (
    0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
)
# G2 generator (standard affine coordinates)
G2_GEN = (
    (
        0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
        0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
    ),
    (
        0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
        0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
    ),
)


# ---------------------------------------------------------------------------
# Fp
# ---------------------------------------------------------------------------


def fp_add(a, b):
    return (a + b) % P381


def fp_sub(a, b):
    return (a - b) % P381


def fp_mul(a, b):
    return a * b % P381


def fp_neg(a):
    return (-a) % P381


def fp_inv(a):
    return pow(a, P381 - 2, P381)


# ---------------------------------------------------------------------------
# Fp2: c0 + c1*u, u^2 = -1
# ---------------------------------------------------------------------------

FP2_ZERO = (0, 0)
FP2_ONE = (1, 0)


def fp2_add(a, b):
    return ((a[0] + b[0]) % P381, (a[1] + b[1]) % P381)


def fp2_sub(a, b):
    return ((a[0] - b[0]) % P381, (a[1] - b[1]) % P381)


def fp2_neg(a):
    return ((-a[0]) % P381, (-a[1]) % P381)


def fp2_mul(a, b):
    # native.rs:702-710
    return ((a[0] * b[0] - a[1] * b[1]) % P381, (a[0] * b[1] + a[1] * b[0]) % P381)


def fp2_mul_fp(a, s):
    return (a[0] * s % P381, a[1] * s % P381)


def fp2_mul_by_nonresidue(a):
    # * (1 + u)  (native.rs:545-549)
    return ((a[0] - a[1]) % P381, (a[0] + a[1]) % P381)


def fp2_multiply_by_b(a):
    # * 4*(1 + u)  (native.rs:539-543)
    t0, t1 = 4 * a[0] % P381, 4 * a[1] % P381
    return ((t0 - t1) % P381, (t0 + t1) % P381)


def fp2_inv(a):
    # native.rs:551-560
    factor = fp_inv((a[0] * a[0] + a[1] * a[1]) % P381)
    return (a[0] * factor % P381, (-a[1]) * factor % P381)


def fp2_conj(a):
    return (a[0], (-a[1]) % P381)


# ---------------------------------------------------------------------------
# Fp6: (c0, c1, c2) over Fp2, v^3 = xi = 1 + u
# ---------------------------------------------------------------------------

FP6_ZERO = (FP2_ZERO, FP2_ZERO, FP2_ZERO)


def fp6_add(a, b):
    return tuple(fp2_add(x, y) for x, y in zip(a, b))


def fp6_sub(a, b):
    return tuple(fp2_sub(x, y) for x, y in zip(a, b))


def fp6_neg(a):
    return tuple(fp2_neg(x) for x in a)


def fp6_mul(a, b):
    """Toom/Karatsuba-style with the exact intermediate chain of
    native.rs:824-861 (the fp6 chip witnesses t0..t19)."""
    c0, c1, c2 = a
    r0, r1, r2 = b
    t0 = fp2_mul(c0, r0)
    t1 = fp2_mul(c1, r1)
    t2 = fp2_mul(c2, r2)
    t3 = fp2_add(c1, c2)
    t4 = fp2_add(r1, r2)
    t5 = fp2_mul(t3, t4)
    t6 = fp2_sub(t5, t1)
    t7 = fp2_sub(t6, t2)
    t8 = fp2_mul_by_nonresidue(t7)
    x = fp2_add(t8, t0)
    t9 = fp2_add(c0, c1)
    t10 = fp2_add(r0, r1)
    t11 = fp2_mul(t9, t10)
    t12 = fp2_sub(t11, t0)
    t13 = fp2_sub(t12, t1)
    t14 = fp2_mul_by_nonresidue(t2)
    y = fp2_add(t13, t14)
    t15 = fp2_add(c0, c2)
    t16 = fp2_add(r0, r2)
    t17 = fp2_mul(t15, t16)
    t18 = fp2_sub(t17, t0)
    t19 = fp2_sub(t18, t2)
    z = fp2_add(t19, t1)
    return (x, y, z)


def fp6_mul_by_nonresidue(a):
    # v * (c0 + c1 v + c2 v^2) = xi*c2 + c0 v + c1 v^2  (native.rs:863-873)
    return (fp2_mul_by_nonresidue(a[2]), a[0], a[1])


def fp6_multiply_by_01(a, b0, b1):
    # native.rs:876-899
    c0, c1, c2 = a
    t0 = fp2_mul(c0, b0)
    t1 = fp2_mul(c1, b1)
    t2 = fp2_mul(c2, b1)
    t3 = fp2_mul_by_nonresidue(t2)
    x = fp2_add(t3, t0)
    t4 = fp2_add(b0, b1)
    t5 = fp2_add(c0, c1)
    t6 = fp2_mul(t4, t5)
    t7 = fp2_sub(t6, t0)
    y = fp2_sub(t7, t1)
    t8 = fp2_mul(c2, b0)
    z = fp2_add(t8, t1)
    return (x, y, z)


def fp6_multiply_by_1(a, b1):
    # native.rs:901-917
    c0, c1, c2 = a
    return (fp2_mul_by_nonresidue(fp2_mul(c2, b1)), fp2_mul(c0, b1), fp2_mul(c1, b1))


def fp6_inv(a):
    # native.rs:720-734
    c0, c1, c2 = a
    t0 = fp2_sub(fp2_mul(c0, c0), fp2_mul_by_nonresidue(fp2_mul(c2, c1)))
    t1 = fp2_sub(fp2_mul_by_nonresidue(fp2_mul(c2, c2)), fp2_mul(c0, c1))
    t2 = fp2_sub(fp2_mul(c1, c1), fp2_mul(c0, c2))
    t4 = fp2_inv(
        fp2_add(
            fp2_mul_by_nonresidue(fp2_add(fp2_mul(c2, t1), fp2_mul(c1, t2))),
            fp2_mul(c0, t0),
        )
    )
    return (fp2_mul(t4, t0), fp2_mul(t4, t1), fp2_mul(t4, t2))


# ---------------------------------------------------------------------------
# Fp12: (c0, c1) over Fp6, w^2 = v
# ---------------------------------------------------------------------------

FP12_ONE = ((FP2_ONE, FP2_ZERO, FP2_ZERO), FP6_ZERO)


def fp12_mul(a, b):
    # native.rs:1009-1027
    c0, c1 = a
    r0, r1 = b
    t0 = fp6_mul(c0, r0)
    t1 = fp6_mul(c1, r1)
    t2 = fp6_mul_by_nonresidue(t1)
    x = fp6_add(t0, t2)
    t3 = fp6_add(c0, c1)
    t4 = fp6_add(r0, r1)
    t5 = fp6_mul(t3, t4)
    t6 = fp6_sub(t5, t0)
    y = fp6_sub(t6, t1)
    return (x, y)


def fp12_multiply_by_014(a, o0, o1, o4):
    # native.rs:1225-1241
    c0, c1 = a
    t0 = fp6_multiply_by_01(c0, o0, o1)
    t1 = fp6_multiply_by_1(c1, o4)
    t2 = fp6_mul_by_nonresidue(t1)
    x = fp6_add(t2, t0)
    t3 = fp6_add(c1, c0)
    t4 = fp2_add(o1, o4)
    t5 = fp6_multiply_by_01(t3, o0, t4)
    t6 = fp6_sub(t5, t0)
    y = fp6_sub(t6, t1)
    return (x, y)


def fp12_conjugate(a):
    return (a[0], fp6_neg(a[1]))


def fp12_inv(a):
    # native.rs:930-938
    c0, c1 = a
    t = fp6_inv(fp6_sub(fp6_mul(c0, c0), fp6_mul_by_nonresidue(fp6_mul(c1, c1))))
    return (fp6_mul(c0, t), fp6_neg(fp6_mul(c1, t)))


def fp4_square(a, b):
    # native.rs:225-232
    a2 = fp2_mul(a, a)
    b2 = fp2_mul(b, b)
    return (
        fp2_add(fp2_mul_by_nonresidue(b2), a2),
        fp2_sub(fp2_sub(fp2_mul(fp2_add(a, b), fp2_add(a, b)), a2), b2),
    )


def fp12_cyclotomic_square(a):
    # native.rs:1251-1298 (same (t - c)*2 + t chain; the chip witnesses it)
    c0c0, c0c1, c0c2 = a[0]
    c1c0, c1c1, c1c2 = a[1]
    t0 = fp4_square(c0c0, c1c1)
    t1 = fp4_square(c1c0, c0c2)
    t2 = fp4_square(c0c1, c1c2)
    t3 = fp2_mul_by_nonresidue(t2[1])

    def step(t, c, sub):
        d = fp2_sub(t, c) if sub else fp2_add(t, c)
        d2 = fp2_mul_fp(d, 2)
        return fp2_add(d2, t)

    c0 = step(t0[0], c0c0, True)
    c1 = step(t1[0], c0c1, True)
    c2 = step(t2[0], c0c2, True)
    c3 = step(t3, c1c0, False)
    c4 = step(t0[1], c1c1, False)
    c5 = step(t1[1], c1c2, False)
    return ((c0, c1, c2), (c3, c4, c5))


def fp12_cyclotomic_exponent(a):
    # square-and-multiply over the bits of BLS_X (native.rs:1300-1309)
    z = FP12_ONE
    for i in reversed(range(BLS_X_BITS)):
        z = fp12_cyclotomic_square(z)
        if (BLS_X >> i) & 1:
            z = fp12_mul(z, a)
    return z


# ---------------------------------------------------------------------------
# Frobenius maps (coefficients computed from the tower, not hard-coded)
# ---------------------------------------------------------------------------

_XI = (1, 1)  # 1 + u


def _xi_pow(exp_num: int, exp_den: int, power: int):
    """xi^((p^power - 1) * exp_num / exp_den) via Fp2 square-and-multiply;
    v^(p^k) = v * xi^((p^k-1)/3) and w^(p^k) = w * xi^((p^k-1)/6)."""
    e = (P381**power - 1) * exp_num // exp_den
    result = FP2_ONE
    base = _XI
    while e:
        if e & 1:
            result = fp2_mul(result, base)
        base = fp2_mul(base, base)
        e >>= 1
    return result


def fp2_frobenius(a, power: int):
    # conjugation when power odd (native.rs:1058-1064)
    return a if power % 2 == 0 else fp2_conj(a)


FP6_FROB_C1 = [_xi_pow(1, 3, k) for k in range(6)]
FP6_FROB_C2 = [_xi_pow(2, 3, k) for k in range(6)]
FP12_FROB = [_xi_pow(1, 6, k) for k in range(12)]


def fp6_frobenius(a, power: int):
    # native.rs:1126-1144
    return (
        fp2_frobenius(a[0], power),
        fp2_mul(fp2_frobenius(a[1], power), FP6_FROB_C1[power % 6]),
        fp2_mul(fp2_frobenius(a[2], power), FP6_FROB_C2[power % 6]),
    )


def fp12_frobenius(a, power: int):
    # native.rs:1201-1221
    r0 = fp6_frobenius(a[0], power)
    c0, c1, c2 = fp6_frobenius(a[1], power)
    coeff = FP12_FROB[power % 12]
    return (r0, (fp2_mul(c0, coeff), fp2_mul(c1, coeff), fp2_mul(c2, coeff)))


def fp12_final_exponentiate(a):
    """The exact 32-step t_0..t_31 addition chain of native.rs:1311-1345
    (the FinalExponentiate chip witnesses every step)."""
    t0 = fp12_frobenius(a, 6)
    t1 = fp12_mul(t0, fp12_inv(a))
    t2 = fp12_frobenius(t1, 2)
    t3 = fp12_mul(t2, t1)
    t4 = fp12_cyclotomic_exponent(t3)
    t5 = fp12_conjugate(t4)
    t6 = fp12_cyclotomic_square(t3)
    t7 = fp12_conjugate(t6)
    t8 = fp12_mul(t7, t5)
    t9 = fp12_cyclotomic_exponent(t8)
    t10 = fp12_conjugate(t9)
    t11 = fp12_cyclotomic_exponent(t10)
    t12 = fp12_conjugate(t11)
    t13 = fp12_cyclotomic_exponent(t12)
    t14 = fp12_conjugate(t13)
    t15 = fp12_cyclotomic_square(t5)
    t16 = fp12_mul(t14, t15)
    t17 = fp12_cyclotomic_exponent(t16)
    t18 = fp12_conjugate(t17)
    t19 = fp12_mul(t5, t12)
    t20 = fp12_frobenius(t19, 2)
    t21 = fp12_mul(t10, t3)
    t22 = fp12_frobenius(t21, 3)
    t23 = fp12_conjugate(t3)
    t24 = fp12_mul(t16, t23)
    t25 = fp12_frobenius(t24, 1)
    t26 = fp12_conjugate(t8)
    t27 = fp12_mul(t18, t26)
    t28 = fp12_mul(t27, t3)
    t29 = fp12_mul(t20, t22)
    t30 = fp12_mul(t29, t25)
    t31 = fp12_mul(t30, t28)
    return t31


# ---------------------------------------------------------------------------
# Pairing pipeline (native.rs:283-366, 1358-1527)
# ---------------------------------------------------------------------------


def calc_precomp_stuff_loop0(rx, ry, rz):
    """Doubling step: returns [new_rx, new_ry, new_rz, t0, t1, x0, t2, t3,
    x1, t4, x3, x2, x4, x5, x6, x7, x8, x9, x10, x11, x12, x13] exactly as
    native.rs:293-326 (the PairingPrecomp chip witnesses each)."""
    t0 = fp2_mul(ry, ry)
    t1 = fp2_mul(rz, rz)
    x0 = fp2_mul_fp(t1, 3)
    t2 = fp2_multiply_by_b(x0)
    t3 = fp2_mul_fp(t2, 3)
    x1 = fp2_mul(ry, rz)
    t4 = fp2_mul_fp(x1, 2)
    x2 = fp2_sub(t2, t0)
    x3 = fp2_mul(rx, rx)
    x4 = fp2_mul_fp(x3, 3)
    x5 = fp2_neg(t4)
    k = pow(2, P381 - 2, P381)  # 1/2
    x6 = fp2_sub(t0, t3)
    x7 = fp2_mul(rx, ry)
    x8 = fp2_mul(x6, x7)
    x9 = fp2_add(t0, t3)
    x10 = fp2_mul_fp(x9, k)
    x11 = fp2_mul(x10, x10)
    x12 = fp2_mul(t2, t2)
    x13 = fp2_mul_fp(x12, 3)
    new_rx = fp2_mul_fp(x8, k)
    new_ry = fp2_sub(x11, x13)
    new_rz = fp2_mul(t0, t4)
    return [new_rx, new_ry, new_rz, t0, t1, x0, t2, t3, x1, t4, x3, x2, x4, x5, x6, x7, x8, x9, x10, x11, x12, x13]


def calc_precomp_stuff_loop1(rx, ry, rz, qx, qy):
    """Addition step intermediates, exactly native.rs:328-366."""
    t0 = fp2_mul(qy, rz)
    t1 = fp2_sub(ry, t0)
    t2 = fp2_mul(qx, rz)
    t3 = fp2_sub(rx, t2)
    t4 = fp2_mul(t1, qx)
    t5 = fp2_mul(t3, qy)
    t6 = fp2_sub(t4, t5)
    t7 = fp2_neg(t1)
    t8 = fp2_mul(t3, t3)
    t9 = fp2_mul(t8, t3)
    t10 = fp2_mul(t8, rx)
    t11 = fp2_mul(t1, t1)
    t12 = fp2_mul(t11, rz)
    t13 = fp2_mul_fp(t10, 2)
    t14 = fp2_sub(t9, t13)
    t15 = fp2_add(t14, t12)
    t16 = fp2_sub(t10, t15)
    t17 = fp2_mul(t16, t1)
    t18 = fp2_mul(t9, ry)
    new_rx = fp2_mul(t3, t15)
    new_ry = fp2_sub(t17, t18)
    new_rz = fp2_mul(rz, t9)
    return [new_rx, new_ry, new_rz, t0, t1, t2, t3, t4, t5, t6, t7, t8, t9, t10, t11, t12, t13, t14, t15, t16, t17, t18]


def calc_pairing_precomp(x, y, z):
    """ell-coefficient triples over the x-parameter bits (native.rs:1358-1437).

    Returns a list of 68 [c0, c1, c2] Fp2 triples: one per doubling step
    (63 iterations over bits 62..0) plus one per addition step (set bits).
    """
    zinv = fp2_inv(z)
    qx = fp2_mul(x, zinv)
    qy = fp2_mul(y, zinv)
    rx, ry, rz = qx, qy, FP2_ONE
    ell = []
    for i in reversed(range(BLS_X_BITS - 1)):
        vals = calc_precomp_stuff_loop0(rx, ry, rz)
        ell.append([vals[11], vals[12], vals[13]])  # [x2, x4, x5]
        rx, ry, rz = vals[0], vals[1], vals[2]
        if (BLS_X >> i) & 1:
            vals1 = calc_precomp_stuff_loop1(rx, ry, rz, qx, qy)
            ell.append([vals1[9], vals1[10], vals1[6]])  # [t6, t7, t3]
            rx, ry, rz = vals1[0], vals1[1], vals1[2]
    return ell


def miller_loop(px, py, qx, qy, qz):
    """native.rs:1440-1468: multiply_by_014 per coeff, square per bit,
    final conjugate."""
    precomputes = calc_pairing_precomp(qx, qy, qz)
    f12 = FP12_ONE
    j = 0
    for i in reversed(range(BLS_X_BITS - 1)):
        c = precomputes[j]
        f12 = fp12_multiply_by_014(f12, c[0], fp2_mul_fp(c[1], px), fp2_mul_fp(c[2], py))
        if (BLS_X >> i) & 1:
            j += 1
            c = precomputes[j]
            f12 = fp12_multiply_by_014(f12, c[0], fp2_mul_fp(c[1], px), fp2_mul_fp(c[2], py))
        if i != 0:
            f12 = fp12_mul(f12, f12)
        j += 1
    return fp12_conjugate(f12)


def pairing(px, py, qx, qy, qz):
    return miller_loop(px, py, qx, qy, qz)


def verify_bls_signature(pk, hm, sig):
    """e(-pk, Hm) * e(G, S) == 1 check (native.rs:1477-1527).

    pk: G1 affine (x, y); hm, sig: G2 projective ((x0,x1),(y0,y1),(z0,z1)).
    """
    pk_neg = (pk[0], (-pk[1]) % P381)
    e1 = pairing(pk_neg[0], pk_neg[1], *hm)
    e2 = pairing(G1_GEN[0], G1_GEN[1], *sig)
    mu = fp12_mul(e1, e2)
    return fp12_final_exponentiate(mu) == FP12_ONE


# ---------------------------------------------------------------------------
# G1 affine ops (for the ECC aggregation chip, g1.rs / ecc_aggregate.rs)
# ---------------------------------------------------------------------------


def g1_add(p1, p2):
    """Affine addition of distinct non-infinity points."""
    (x1, y1), (x2, y2) = p1, p2
    assert x1 != x2, "use g1_double for equal points"
    lam = (y2 - y1) * fp_inv((x2 - x1) % P381) % P381
    x3 = (lam * lam - x1 - x2) % P381
    y3 = (lam * (x1 - x3) - y1) % P381
    return (x3, y3)


def g1_double(p):
    (x1, y1) = p
    lam = 3 * x1 * x1 * fp_inv(2 * y1 % P381) % P381
    x3 = (lam * lam - 2 * x1) % P381
    y3 = (lam * (x1 - x3) - y1) % P381
    return (x3, y3)


def g1_aggregate(points, bits):
    """Aggregate selected G1 points by sequential addition, mirroring the
    skip logic of ecc_aggregate.rs:37-82 (bit=0 points pass through)."""
    acc = None
    for p, b in zip(points, bits):
        if not b:
            continue
        if acc is None:
            acc = p
        elif acc == p:
            acc = g1_double(acc)
        else:
            acc = g1_add(acc, p)
    return acc


def g1_is_on_curve(p):
    x, y = p
    return (y * y - (x * x * x + 4)) % P381 == 0


def g2_is_on_curve(q):
    x, y = q
    rhs = fp2_add(fp2_mul(fp2_mul(x, x), x), fp2_multiply_by_b(FP2_ONE))
    return fp2_mul(y, y) == rhs
