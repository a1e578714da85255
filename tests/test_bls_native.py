"""Native BLS12-381 layer tests.

Golden vectors are DATA taken from the reference's own tests
(`native.rs:1477-1527` signature check values, `native.rs:1052-1056`
Frobenius coefficient table entries) plus algebraic self-checks.
"""

from starky_bls12_381_tpu.fields import bls12_381 as bls

import pytest

pytestmark = pytest.mark.smoke

# test data from native.rs:1480-1498 (public test vectors)
PK = (
    2620359726099670991095913421423408052907220385587653382880494211997835858894431070728023161812841650498384724513574,
    3516737663249789719313994746945990853755171862112391852604784999536233979171013701039178918880615112139780777770781,
)
HM = (
    (
        2260803321181951703309420903406460477209912434020120381027413359130883713514969717876465885091628521232768207917010,
        2651754974217764549573984422821173864573267897233450902768900290919635595830847280035238812354259899816422437732519,
    ),
    (
        98328085801950751198634977711657076320088798571641012335466428770177401024922163125657710674003178075431656844523,
        1156585784149709375944843577113354173925120574246839648967751052400396372157500751188298724114933365921247443786825,
    ),
    (1, 0),
)
SIG = (
    (
        1836830352577417292089156350591626007357750969609299199820146458689304398967104037069103513169938118550765216427090,
        2100427494885604888487796981102940167438916035063712025295231442815788486916593575072180414962669967540847907858502,
    ),
    (
        2555154678035007654633840738122526356989849358171638629627190730328888205299908476410927833296830659413727831906911,
        697448450483092846649680958149948400499140883635140106996999493850809967308993531752440334328367413010709405099565,
    ),
    (1, 0),
)


def test_tower_basics():
    a = (12345, 67890)
    assert bls.fp2_mul(a, bls.fp2_inv(a)) == bls.FP2_ONE
    f6 = ((3, 5), (7, 11), (13, 17))
    assert bls.fp6_mul(f6, bls.fp6_inv(f6)) == ((1, 0), (0, 0), (0, 0))
    f12 = (f6, ((19, 23), (29, 31), (37, 41)))
    assert bls.fp12_mul(f12, bls.fp12_inv(f12)) == bls.FP12_ONE


def test_frobenius_coefficients_match_reference():
    # native.rs:1052-1056 (Fp2 Frobenius coefficient for odd power is -1;
    # conjugation) and spot-check of the computed Fp6/Fp12 tables against
    # the reference's hard-coded decimals (native.rs:1077, 1155-1156).
    assert bls.FP6_FROB_C1[1] == (
        0,
        4002409555221667392624310435006688643935503118305586438271171395842971157480381377015405980053539358417135540939436,
    )
    assert bls.FP12_FROB[1] == (
        3850754370037169011952147076051364057158807420970682438676050522613628423219637725072182697113062777891589506424760,
        151655185184498381465642749684540099398075398968325446656007613510403227271200139370504932015952886146304766135027,
    )


def test_frobenius_is_power_of_p_map():
    f12 = (((3, 5), (7, 11), (13, 17)), ((19, 23), (29, 31), (37, 41)))
    # frobenius(x)^(p^k) consistency: frob^2 applied twice == frob(2)
    a = bls.fp12_frobenius(bls.fp12_frobenius(f12, 1), 1)
    b = bls.fp12_frobenius(f12, 2)
    assert a == b


def test_generators_on_curve():
    assert bls.g1_is_on_curve(bls.G1_GEN)
    assert bls.g2_is_on_curve(bls.G2_GEN)


def test_g1_ops():
    g = bls.G1_GEN
    g2 = bls.g1_double(g)
    g3 = bls.g1_add(g2, g)
    g4a = bls.g1_double(g2)
    g4b = bls.g1_add(g3, g)
    assert g4a == g4b
    assert bls.g1_is_on_curve(g4a)


def test_bls_signature_verification():
    # the reference's end-to-end golden vector (native.rs:1529-1543)
    assert bls.verify_bls_signature(PK, HM, SIG)


def test_bls_signature_rejects_bad_sig():
    bad = ((SIG[0][0] + 1, SIG[0][1]), SIG[1], SIG[2])
    assert not bls.verify_bls_signature(PK, HM, bad)


def test_final_exponentiate_of_one():
    assert bls.fp12_final_exponentiate(bls.FP12_ONE) == bls.FP12_ONE


def test_pairing_bilinearity_light():
    # e(-pk, hm) * e(g, sig) == 1 is already bilinearity; also check
    # precomp count: 63 doubling + 5 addition steps (x has 6 set bits, top
    # bit consumed by init) = 68 coefficient triples (SURVEY.md §2.1)
    coeffs = bls.calc_pairing_precomp(*HM)
    assert len(coeffs) == 68
