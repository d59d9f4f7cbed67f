from zprize_tpu.params import R_MOD, FR_TWO_ADIC_ROOT, FR_TWO_ADICITY
from zprize_tpu.ref.field import fr_batch_inv, root_of_unity
from zprize_tpu.ref.domain import Domain, poly_eval, poly_divide_linear


def test_two_adic_root():
    assert pow(FR_TWO_ADIC_ROOT, 1 << FR_TWO_ADICITY, R_MOD) == 1
    assert pow(FR_TWO_ADIC_ROOT, 1 << (FR_TWO_ADICITY - 1), R_MOD) != 1


def test_batch_inv():
    xs = [3, 7, 11, R_MOD - 2]
    invs = fr_batch_inv(xs)
    for x, i in zip(xs, invs):
        assert x * i % R_MOD == 1


def test_fft_roundtrip():
    d = Domain(64)
    coeffs = [i * 7 + 1 for i in range(64)]
    assert d.ifft(d.fft(coeffs)) == coeffs


def test_fft_matches_naive_eval():
    d = Domain(8)
    coeffs = [5, 1, 2, 3, 0, 0, 1, 9]
    evals = d.fft(coeffs)
    for i in range(8):
        assert evals[i] == poly_eval(coeffs, d.element(i))


def test_coset_fft():
    from zprize_tpu.params import FR_GENERATOR
    d = Domain(8)
    coeffs = [5, 1, 2, 3, 0, 0, 1, 9]
    evals = d.coset_fft(coeffs)
    for i in range(8):
        x = FR_GENERATOR * d.element(i) % R_MOD
        assert evals[i] == poly_eval(coeffs, x)
    assert d.coset_ifft(evals) == coeffs


def test_poly_divide_linear():
    coeffs = [3, 1, 4, 1, 5]
    z = 97
    q = poly_divide_linear(coeffs, z)
    # p(X) = q(X)(X-z) + p(z)
    x = 12345
    lhs = poly_eval(coeffs, x)
    rhs = (poly_eval(q, x) * ((x - z) % R_MOD) + poly_eval(coeffs, z)) % R_MOD
    assert lhs == rhs


def test_lagrange_coefficients():
    d = Domain(8)
    tau = 987654321
    ls = d.evaluate_all_lagrange_coefficients(tau)
    coeffs = [5, 1, 2, 3, 0, 0, 1, 9]
    evals = d.fft(coeffs)
    acc = sum(l * e for l, e in zip(ls, evals)) % R_MOD
    assert acc == poly_eval(coeffs, tau)
