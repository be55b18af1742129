//! Emit open-proof transcripts from the ring-zk reference as the JSON
//! interchange vectors consumed by ringzk_tpu's tests/test_interop.py
//! (format: docs/INTEROP.md -- nested lists of centered i64 coefficients,
//! zero-padded to N, one object per transcript).
//!
//! Everything is read off the public protocol structs via their serde
//! derives (Opening/Mat/Polynomial all Serialize), so no ring-zk fork is
//! needed. Run on a cargo machine and drop the output into tests/vectors/.

use poly_ring_xnp1::zq::ZqI64;
use rand::{rngs::StdRng, SeedableRng};
use ring_zk::{
    LinearProofProver, LinearProofVerifier, OpenProofProver, OpenProofVerifier,
    Params, SumProofProver, SumProofVerifier,
};
use serde_json::{json, Value};

/// A serialized coefficient. ZqI64<Q> is expected to serialize
/// transparently as its inner i64 (newtype structs do under serde_json);
/// accept a single-field struct too in case it is a named-field struct --
/// either way the value is the centered residue the reference stores
/// (/root/reference/src/params.rs:121-127 sets q = Q/2, residues in
/// [-Q/2, Q/2]).
fn int_of(v: &Value) -> i64 {
    if let Some(x) = v.as_i64() {
        return x;
    }
    if let Some(obj) = v.as_object() {
        if obj.len() == 1 {
            if let Some(x) = obj.values().next().unwrap().as_i64() {
                return x;
            }
        }
    }
    panic!("unexpected integer serde shape: {v}")
}

/// Coefficient list of a serialized Polynomial. poly-ring-xnp1 v0.3 is
/// expected to emit a bare coefficient array with trailing zeros trimmed
/// (the 36-byte bincode golden in /root/reference/src/mat.rs:425-438 --
/// 8-byte vec length + 8 + 3*4 payload -- implies a plain length-prefixed
/// Vec<I> with no struct framing); accept a single-field struct wrapper
/// (e.g. {"coeffs": [...]}) too, so a different derive layout does not
/// strand the one cargo machine that runs this generator.
fn coeffs_of(v: &Value) -> Vec<i64> {
    if let Some(arr) = v.as_array() {
        return arr.iter().map(int_of).collect();
    }
    if let Some(obj) = v.as_object() {
        if obj.len() == 1 {
            if let Some(arr) = obj.values().next().unwrap().as_array() {
                return arr.iter().map(int_of).collect();
            }
        }
    }
    panic!("unexpected Polynomial serde shape: {v}")
}

/// Pad a serialized Polynomial (coeff list, trailing zeros trimmed by
/// poly-ring-xnp1's serde) to exactly n coefficients.
fn pad_poly(v: &Value, n: usize) -> Value {
    let mut c = coeffs_of(v);
    assert!(c.len() <= n, "more than N coefficients");
    c.resize(n, 0);
    json!(c)
}

/// A serialized Vec<Polynomial> -> [[i64; n]; rows].
fn pad_polyvec(v: &Value, n: usize) -> Value {
    Value::Array(
        v.as_array()
            .expect("expected a polynomial vector")
            .iter()
            .map(|p| pad_poly(p, n))
            .collect(),
    )
}

/// A serialized Mat (rows x 1 column matrix: {"polynomials": [[p]; rows]})
/// -> [[i64; n]; rows].
fn pad_mat_col(v: &Value, n: usize) -> Value {
    let rows = v["polynomials"]
        .as_array()
        .expect("Mat must serialize as {polynomials: [[...]]}");
    Value::Array(
        rows.iter()
            .map(|row| {
                let row = row.as_array().expect("Mat row");
                assert_eq!(row.len(), 1, "expected a column matrix");
                pad_poly(&row[0], n)
            })
            .collect(),
    )
}

/// A serialized Mat with several columns -> [[[i64; n]; cols]; rows].
fn pad_mat(v: &Value, n: usize) -> Value {
    let rows = v["polynomials"].as_array().expect("Mat");
    Value::Array(
        rows.iter()
            .map(|row| {
                Value::Array(
                    row.as_array()
                        .expect("Mat row")
                        .iter()
                        .map(|p| pad_poly(p, n))
                        .collect(),
                )
            })
            .collect(),
    )
}

fn one_vector<const N: usize>(seed: u64, msg: Vec<Vec<i64>>) -> Value {
    one_vector_with::<N>(seed, msg, Params::default(), true)
}

/// Generic over the ZqI64 modulus so non-default rings can be recorded:
/// the wide family (Q >= 2^32, the full i64 envelope ringzk_tpu's
/// ops/mont64.py covers) and any custom parameter set. ZqI64<Q> satisfies
/// every Params/prover trait bound for all Q, so no where-clauses needed.
fn one_vector_q<const Q: i64, const N: usize>(
    seed: u64,
    msg: Vec<Vec<i64>>,
    params: Params<ZqI64<Q>>,
    run_verify: bool,
) -> Value {
    let rng = &mut StdRng::seed_from_u64(seed);

    let ck = params.generate_commitment_key::<N>(rng);
    let ck_json = serde_json::to_value(&ck).unwrap();

    let x = params.prepare_value::<N>(
        msg.iter()
            .map(|row| row.iter().map(|&c| c.into()).collect())
            .collect(),
    );
    let x_json = serde_json::to_value(&x).unwrap();

    let prover = OpenProofProver::new(ck.clone(), params.clone());
    let verifier = OpenProofVerifier::new(ck.clone(), params.clone());

    let (rctx, pcom) = prover.commit(rng, x);
    let rctx_json = serde_json::to_value(&rctx).unwrap();
    let pcom_json = serde_json::to_value(&pcom).unwrap();

    let (vctx, chal) = verifier.generate_challenge(rng, pcom);
    let chal_json = serde_json::to_value(&chal).unwrap();
    let response = prover.create_response(rctx, chal);
    let resp_json = serde_json::to_value(&response).unwrap();
    if run_verify {
        assert!(verifier.verify(response, vctx), "reference rejected its own proof");
    }

    // params.q serializes via the Params derive; read it back out
    let params_json = serde_json::to_value(&params).unwrap();

    json!({
        "n": N,
        "seed": seed,
        "params": {
            "q": int_of(&params_json["q"]),
            "b": int_of(&params_json["b"]),
            "n": params_json["n"],
            "k": params_json["k"],
            "l": params_json["l"],
            "kappa": params_json["kappa"],
        },
        "ck": {
            "a1": pad_mat(&ck_json["a1"], N),
            "a2": pad_mat(&ck_json["a2"], N),
        },
        "x": pad_polyvec(&x_json, N),
        "r": pad_mat_col(&rctx_json["opening"]["r"], N),
        "y": pad_mat_col(&rctx_json["y"], N),
        "d": pad_poly(&chal_json["d"], N),
        "c": pad_mat_col(&pcom_json["c"]["c"], N),
        "t": pad_polyvec(&pcom_json["t"], N),
        "z": pad_mat_col(&resp_json["z"], N),
    })
}

/// `run_verify = false` is for parameter sets the REFERENCE cannot verify:
/// for n != l its buggy `c1_c2` split (/root/reference/src/commit.rs:213-218
/// via split_off at /root/reference/src/mat.rs:206) hands the verifier an
/// l-row "c1" where n rows are needed, and `Mat::add` panics
/// (/root/reference/src/mat.rs:128-130). The prover-side transcript is
/// still well-defined and recorded; ringzk_tpu's checker replays it with
/// the corrected split (utils/testvectors.py) -- the divergence case where
/// cross-validation matters most.
fn one_vector_with<const N: usize>(
    seed: u64,
    msg: Vec<Vec<i64>>,
    params: Params<ZqI64<3515337053_i64>>,
    run_verify: bool,
) -> Value {
    one_vector_q::<3515337053_i64, N>(seed, msg, params, run_verify)
}

fn linear_vector<const N: usize>(seed: u64) -> Value {
    let rng = &mut StdRng::seed_from_u64(seed);
    let params = Params::default();
    let ck = params.generate_commitment_key::<N>(rng);
    let ck_json = serde_json::to_value(&ck).unwrap();
    let x = params.prepare_value::<N>(vec![vec![1.into(), 2.into(), 3.into()]]);
    let g = params.prepare_scalar::<N>(vec![5.into(), 7.into()]);
    let x_json = serde_json::to_value(&x).unwrap();
    let g_json = serde_json::to_value(&g).unwrap();

    let prover = LinearProofProver::new(ck.clone(), params.clone());
    let verifier = LinearProofVerifier::new(ck.clone(), params.clone());
    let (rctx, pcom) = prover.commit(rng, g, x);
    let rctx_json = serde_json::to_value(&rctx).unwrap();
    let pcom_json = serde_json::to_value(&pcom).unwrap();
    let (vctx, chal) = verifier.generate_challenge(rng, pcom);
    let chal_json = serde_json::to_value(&chal).unwrap();
    let response = prover.create_response(rctx, chal);
    // LinearProofResponse derives no serde in the reference (a documented
    // inconsistency) -- recompute z/zp on the Python side instead of
    // recording them: the vector still pins every input + c/cp/t/tp/u.
    assert!(verifier.verify(response, vctx));
    let params_json = serde_json::to_value(&params).unwrap();

    json!({
        "protocol": "linear",
        "n": N,
        "seed": seed,
        "params": {
            "q": params_json["q"], "b": params_json["b"], "n": params_json["n"],
            "k": params_json["k"], "l": params_json["l"],
            "kappa": params_json["kappa"],
        },
        "ck": {"a1": pad_mat(&ck_json["a1"], N), "a2": pad_mat(&ck_json["a2"], N)},
        "g": pad_poly(&g_json, N),
        "x": pad_polyvec(&x_json, N),
        "r": pad_mat_col(&rctx_json["opening"]["r"], N),
        "rp": pad_mat_col(&rctx_json["opening_p"]["r"], N),
        "y": pad_mat_col(&rctx_json["y"], N),
        "yp": pad_mat_col(&rctx_json["yp"], N),
        "d": pad_poly(&chal_json["d"], N),
        "c": pad_mat_col(&pcom_json["c"]["c"], N),
        "cp": pad_mat_col(&pcom_json["cp"]["c"], N),
        "t": pad_polyvec(&pcom_json["t"], N),
        "tp": pad_polyvec(&pcom_json["tp"], N),
        "u": pad_mat_col(&pcom_json["u"], N),
        // z/zp recomputed by the checker from (y, yp, d, r, rp)
        "z": Value::Null, "zp": Value::Null,
    })
}

fn sum_vector<const N: usize>(seed: u64, vl: usize) -> Value {
    let rng = &mut StdRng::seed_from_u64(seed);
    let params = Params::default();
    let ck = params.generate_commitment_key::<N>(rng);
    let ck_json = serde_json::to_value(&ck).unwrap();
    let xs: Vec<_> = (0..vl)
        .map(|i| params.prepare_value::<N>(vec![vec![(i as i64 + 1).into()]]))
        .collect();
    let gs: Vec<_> = (0..vl)
        .map(|i| params.prepare_scalar::<N>(vec![(2 * i as i64 + 1).into()]))
        .collect();
    let xs_json = serde_json::to_value(&xs).unwrap();
    let gs_json = serde_json::to_value(&gs).unwrap();

    let prover = SumProofProver::new(ck.clone(), params.clone());
    let verifier = SumProofVerifier::new(ck.clone(), params.clone());
    let (rctx, pcom) = prover.commit(rng, gs, xs);
    let rctx_json = serde_json::to_value(&rctx).unwrap();
    let pcom_json = serde_json::to_value(&pcom).unwrap();
    let (vctx, chal) = verifier.generate_challenge(rng, pcom);
    let chal_json = serde_json::to_value(&chal).unwrap();
    let response = prover.create_response(rctx, chal);
    let resp_json = serde_json::to_value(&response).unwrap();
    assert!(verifier.verify(response, vctx));
    let params_json = serde_json::to_value(&params).unwrap();

    let arr = |v: &Value, f: &dyn Fn(&Value) -> Value| -> Value {
        Value::Array(v.as_array().unwrap().iter().map(|e| f(e)).collect())
    };
    json!({
        "protocol": "sum",
        "n": N,
        "seed": seed,
        "params": {
            "q": params_json["q"], "b": params_json["b"], "n": params_json["n"],
            "k": params_json["k"], "l": params_json["l"],
            "kappa": params_json["kappa"],
        },
        "ck": {"a1": pad_mat(&ck_json["a1"], N), "a2": pad_mat(&ck_json["a2"], N)},
        "gs": arr(&gs_json, &|p| pad_poly(p, N)),
        "xs": arr(&xs_json, &|v| pad_polyvec(v, N)),
        "rs": arr(&rctx_json["openings"], &|o| pad_mat_col(&o["r"], N)),
        "rp": pad_mat_col(&rctx_json["opening_p"]["r"], N),
        "ys": arr(&rctx_json["ys"], &|m| pad_mat_col(m, N)),
        "yp": pad_mat_col(&rctx_json["yp"], N),
        "d": pad_poly(&chal_json["d"], N),
        "cs": arr(&pcom_json["cs"], &|c| pad_mat_col(&c["c"], N)),
        "cp": pad_mat_col(&pcom_json["cp"]["c"], N),
        "ts": arr(&pcom_json["ts"], &|t| pad_polyvec(t, N)),
        "tp": pad_polyvec(&pcom_json["tp"], N),
        "u": pad_mat_col(&pcom_json["u"], N),
        "zs": arr(&resp_json["zs"], &|z| pad_mat_col(z, N)),
        "zp": pad_mat_col(&resp_json["zp"], N),
    })
}

fn main() {
    let mut vectors = Vec::new();
    for seed in 0..4u64 {
        vectors.push(one_vector::<16>(seed, vec![vec![1, 2, 3, 4]]));
    }
    // BASELINE config 1: N=512, message [1,2,3,4]
    vectors.push(one_vector::<512>(42, vec![vec![1, 2, 3, 4]]));
    for seed in 0..2u64 {
        vectors.push(linear_vector::<16>(100 + seed));
        vectors.push(sum_vector::<16>(200 + seed, 3));
    }
    // n != l: the reference's own verifier panics on these (buggy c1_c2
    // split, see one_vector_with) -- record the prover transcript only;
    // the Python checker validates the algebra with the corrected split.
    let nl_params = Params {
        n: 2,
        k: 5,
        ..Params::default()
    };
    for seed in 0..2u64 {
        vectors.push(one_vector_with::<16>(
            300 + seed,
            vec![vec![1, 2, 3, 4]],
            nl_params.clone(),
            false,
        ));
    }
    // wide-ring family: a ZqI64 modulus past 2^32 (the full i64 envelope
    // ringzk_tpu covers with ops/mont64.py). Q = 2^33 + 9 matches the
    // Python suite's wide tests (tests/test_bigmod.py).
    const QW: i64 = 8589934601;
    let wide_params = Params::<ZqI64<QW>> {
        q: ZqI64::from(QW / 2),
        b: ZqI64::from(1_i64),
        n: 1,
        k: 3,
        l: 1,
        kappa: 36,
    };
    for seed in 0..2u64 {
        vectors.push(one_vector_q::<QW, 16>(
            400 + seed,
            vec![vec![1, 2, 3, 4]],
            wide_params.clone(),
            true,
        ));
    }
    // k > 16 family: exercises the accumulation envelope past the old
    // ACC_MAX ceiling (ringzk_tpu chunked reduction, tests/test_envelope.py)
    let k20_params = Params {
        k: 20,
        ..Params::default()
    };
    for seed in 0..2u64 {
        vectors.push(one_vector_with::<16>(
            500 + seed,
            vec![vec![1, 2, 3, 4]],
            k20_params.clone(),
            true,
        ));
    }
    println!("{}", serde_json::to_string_pretty(&Value::Array(vectors)).unwrap());
}
