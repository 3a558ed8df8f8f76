"""snarkjs/websnark format interop + circom R1CS loader + verifier codegen.

Round-trip coverage of the serialization dialects the reference stack speaks
(SURVEY §2.2 "Binarify" row; binarify.ts:10-207): snarkjs JSON keys,
websnark packed binary, circom circuit JSON, Solidity verifier source."""

import json
import os

import pytest

from zkrollup.groth16 import setup, prove, verify
from zkrollup.groth16 import interop as io
from zkrollup.groth16.keys import Proof
from zkrollup.r1cs.builder import Builder
from zkrollup.r1cs import circom_loader
from zkrollup.chain.genverifier import generate_verifier
from zkrollup.ref.bn254 import R as FR_MOD, Q

SEED = b"interop-test-seed"


def cubic_builder(x=3, y=5):
    bld = Builder()
    out = bld.alloc_output_deferred()
    ypub = bld.alloc_public_input(y)
    xv = bld.alloc(x)
    x3 = bld.mul(bld.mul(xv, xv), xv)
    bld.bind_output(out, x3 + ypub)
    return bld


@pytest.fixture(scope="module")
def pk():
    return setup(cubic_builder().r1cs(), seed=SEED)


@pytest.fixture(scope="module")
def proof_pub(pk):
    bld = cubic_builder()
    return prove(pk, bld.r1cs(), bld.witness(), r=5, s=6), \
        bld.public_signals()


class TestSnarkjsJson:
    def test_pk_export_shape(self, pk):
        j = io.proving_key_to_snarkjs(pk, cubic_builder().r1cs())
        assert j["protocol"] == "groth"
        assert int(j["nVars"]) == pk.n_vars
        assert int(j["nPublic"]) == pk.n_public - 1
        assert int(j["domainSize"]) == pk.domain_size
        assert len(j["A"]) == pk.n_vars
        assert len(j["hExps"]) == pk.domain_size
        # JSON-serializable end to end
        json.dumps(j)

    def test_pk_roundtrip_produces_same_proofs(self, pk, proof_pub):
        r1cs = cubic_builder().r1cs()
        j = io.proving_key_to_snarkjs(pk, r1cs)
        pk2 = io.proving_key_from_snarkjs(j, vk=pk.vk)
        bld = cubic_builder()
        p2 = prove(pk2, bld.r1cs(), bld.witness(), r=5, s=6)
        assert p2 == proof_pub[0]

    def test_vk_roundtrip(self, pk):
        j = io.verifying_key_to_snarkjs(pk.vk)
        vk2 = io.verifying_key_from_snarkjs(j)
        assert vk2 == pk.vk

    def test_vk_json_verifies_proof(self, pk, proof_pub):
        vk2 = io.verifying_key_from_snarkjs(
            io.verifying_key_to_snarkjs(pk.vk))
        proof, pub = proof_pub
        assert verify(vk2, proof, pub)

    def test_proof_roundtrip(self, proof_pub):
        proof, _ = proof_pub
        assert io.proof_from_snarkjs(io.proof_to_snarkjs(proof)) == proof


class TestWebsnarkBinary:
    def test_witness_roundtrip(self):
        w = [1, 2, FR_MOD - 1, 0, 12345678901234567890]
        data = io.binarify_witness(w)
        assert len(data) == 32 * len(w)
        assert io.parse_websnark_witness(data) == [x % FR_MOD for x in w]

    def test_key_binary_roundtrip(self, pk):
        r1cs = cubic_builder().r1cs()
        j = io.proving_key_to_snarkjs(pk, r1cs)
        blob = io.binarify_proving_key(j)
        back = io.parse_websnark_proving_key(blob)
        ju = io.unstringify_bigints(j)
        assert back["nVars"] == ju["nVars"]
        assert back["nPublic"] == ju["nPublic"]
        assert back["domainSize"] == ju["domainSize"]
        assert back["A"] == ju["A"]
        assert back["B1"] == ju["B1"]
        assert back["B2"] == ju["B2"]
        assert back["hExps"] == ju["hExps"]
        assert back["polsA"] == ju["polsA"]
        assert back["polsB"] == ju["polsB"]
        # C: skipped entries come back as infinity placeholders
        npub = ju["nPublic"]
        assert back["C"][npub + 1:] == ju["C"][npub + 1:]

    def test_binary_layout_header(self, pk):
        """Header layout per binarify.ts:150-161: nVars, nPublic,
        domainSize, then 7 pointers; first pointer lands right after the
        5 vk points (3 G1 + 2 G2 = 3*64 + 2*128 = 448 bytes + 40 header)."""
        import struct
        j = io.proving_key_to_snarkjs(pk, cubic_builder().r1cs())
        blob = io.binarify_proving_key(j)
        n_vars, n_pub, m = struct.unpack_from("<III", blob, 0)
        ptrs = struct.unpack_from("<7I", blob, 12)
        assert (n_vars, n_pub, m) == (pk.n_vars, pk.n_public - 1,
                                      pk.domain_size)
        assert ptrs[0] == 40 + 448
        assert all(ptrs[i] < ptrs[i + 1] for i in range(6))

    def test_prove_with_binary_roundtripped_key(self, pk, proof_pub):
        """Full interop loop: our key -> snarkjs JSON -> websnark binary ->
        parsed back -> device key -> identical proof."""
        r1cs = cubic_builder().r1cs()
        blob = io.binarify_proving_key(
            io.proving_key_to_snarkjs(pk, r1cs))
        pk2 = io.proving_key_from_snarkjs(
            io.parse_websnark_proving_key(blob), vk=pk.vk)
        bld = cubic_builder()
        p2 = prove(pk2, bld.r1cs(), bld.witness(), r=5, s=6)
        assert p2 == proof_pub[0]
        assert verify(pk.vk, p2, bld.public_signals())


class TestCircomLoader:
    def test_r1cs_roundtrip(self):
        r1cs = cubic_builder().r1cs()
        d = circom_loader.r1cs_to_circom_dict(r1cs)
        r2 = circom_loader.load_circom_dict(d)
        assert r2.n_vars == r1cs.n_vars
        assert r2.n_outputs == r1cs.n_outputs
        assert r2.n_public_inputs == r1cs.n_public_inputs
        assert r2.constraints == r1cs.constraints

    def test_setup_and_prove_from_loaded_circuit(self, tmp_path):
        """Foreign-circuit path: compile-shape JSON -> R1CS -> setup ->
        prove with an externally supplied witness."""
        bld = cubic_builder()
        path = str(tmp_path / "circuit.json")
        with open(path, "w") as f:
            json.dump(circom_loader.r1cs_to_circom_dict(bld.r1cs()), f)
        r1cs = circom_loader.load_circom_json(path)
        pk = setup(r1cs, seed=SEED)
        proof = prove(pk, r1cs, bld.witness(), r=2, s=3)
        assert verify(pk.vk, proof, bld.public_signals())


class TestGenVerifier:
    def test_source_embeds_key_and_abi(self, pk):
        src = generate_verifier(pk.vk, name="CubicVerifier")
        n = len(pk.vk.ic) - 1
        assert "contract CubicVerifier" in src
        assert f"uint256[{n}] memory input" in src
        # every IC point's coordinates appear in the source
        for pt in pk.vk.ic:
            assert str(pt[0]) in src and str(pt[1]) in src
        assert str(pk.vk.alpha1[0]) in src
        assert str(Q) in src
        # beta2 embedded in EVM (imag, real) order: x1 before x0
        x0, x1 = pk.vk.beta2[0]
        assert src.index(str(x1)) < src.index(str(x0))

    def test_balanced_braces(self, pk):
        src = generate_verifier(pk.vk)
        assert src.count("{") == src.count("}")


class TestWebsnarkGoldenFixture:
    """Hand-authored golden bytes for the websnark packed-key layout.

    Built DIRECTLY from the binarify.ts spec
    (/root/reference/operator/src/utils/binarify.ts:50-207) by an
    independent throwaway script — NOT by this repo's writer — so
    writer+parser-symmetric layout mistakes (swapped field order, wrong
    Montgomery modulus, missed C-table skip) cannot hide behind the
    round-trip tests above. Tiny key: nVars=3, nPublic=1, domainSize=2;
    points are the real G1/G2 generators and 2*G1.
    """

    FIXTURE_HEX = ("030000000100000002000000e80100006002000090020000500300001004000090050000d00500009d0d8fc58d435dd33d0bc7f528eb780a2c4679786fa36e662fdf079ac1770a0e3a1b1e8b1b87baa67b168eeb51d6f114588cf2f0de46ddcc5ebe0f3483ef141c38eae7c3b66004e169548e438b540bbcecc20a0cb42d82c24d018d099773221347fd7cd8168c203c8dca7168916a81975d588181b64550b829a031e1724e64049d0d8fc58d435dd33d0bc7f528eb780a2c4679786fa36e662fdf079ac1770a0e3a1b1e8b1b87baa67b168eeb51d6f114588cf2f0de46ddcc5ebe0f3483ef141c2620bc02d1b5838e72017b493519ebdcdf1a81974726b8fb3b5096af4138571940614ca87d73b4afc4d802585add4360862fa052fc50e9096b7bea3a83f0fe14f6e96b889dfa9d61789b9ef597d27ffefe7d1b23621a9eff06429eaeeb7efd28ee5618c7565b0964bb3c7d3222f957dc76103533be35f9558264fd93e6a0a40d2620bc02d1b5838e72017b493519ebdcdf1a81974726b8fb3b5096af4138571940614ca87d73b4afc4d802585add4360862fa052fc50e9096b7bea3a83f0fe14f6e96b889dfa9d61789b9ef597d27ffefe7d1b23621a9eff06429eaeeb7efd28ee5618c7565b0964bb3c7d3222f957dc76103533be35f9558264fd93e6a0a40d0100000000000000fbffff4f1c3496ac29cd609f9576fc362e4679786fa36e662fdf079ac1770a0e000000000200000000000000dbffff4f9e81573001bb3268866d7f30893a4e489fec655cf8d9d37365a9800101000000e6ffff9ff90e0d1b3f912aa3a368baea8906ddd876ebd847c3bbf5205508d015000000000100000001000000f1ffffef549cc2057d6722dec063f5a48ad26b694eea4b338e9d17ce44671f2a000000009d0d8fc58d435dd33d0bc7f528eb780a2c4679786fa36e662fdf079ac1770a0e3a1b1e8b1b87baa67b168eeb51d6f114588cf2f0de46ddcc5ebe0f3483ef141c38eae7c3b66004e169548e438b540bbcecc20a0cb42d82c24d018d099773221347fd7cd8168c203c8dca7168916a81975d588181b64550b829a031e1724e64049d0d8fc58d435dd33d0bc7f528eb780a2c4679786fa36e662fdf079ac1770a0e3a1b1e8b1b87baa67b168eeb51d6f114588cf2f0de46ddcc5ebe0f3483ef141c38eae7c3b66004e169548e438b540bbcecc20a0cb42d82c24d018d099773221347fd7cd8168c203c8dca7168916a81975d588181b64550b829a031e1724e64049d0d8fc58d435dd33d0bc7f528eb780a2c4679786fa36e662fdf079ac1770a0e3a1b1e8b1b87baa67b168eeb51d6f114588cf2f0de46ddcc5ebe0f3483ef141c38eae7c3b66004e169548e438b540bbcecc20a0cb42d82c24d018d099773221347fd7cd8168c203c8dca7168916a81975d588181b64550b829a031e1724e64042620bc02d1b5838e72017b493519ebdcdf1a81974726b8fb3b5096af4138571940614ca87d73b4afc4d802585add4360862fa052fc50e9096b7bea3a83f0fe14f6e96b889dfa9d61789b9ef597d27ffefe7d1b23621a9eff06429eaeeb7efd28ee5618c7565b0964bb3c7d3222f957dc76103533be35f9558264fd93e6a0a40d2620bc02d1b5838e72017b493519ebdcdf1a81974726b8fb3b5096af4138571940614ca87d73b4afc4d802585add4360862fa052fc50e9096b7bea3a83f0fe14f6e96b889dfa9d61789b9ef597d27ffefe7d1b23621a9eff06429eaeeb7efd28ee5618c7565b0964bb3c7d3222f957dc76103533be35f9558264fd93e6a0a40d2620bc02d1b5838e72017b493519ebdcdf1a81974726b8fb3b5096af4138571940614ca87d73b4afc4d802585add4360862fa052fc50e9096b7bea3a83f0fe14f6e96b889dfa9d61789b9ef597d27ffefe7d1b23621a9eff06429eaeeb7efd28ee5618c7565b0964bb3c7d3222f957dc76103533be35f9558264fd93e6a0a40d38eae7c3b66004e169548e438b540bbcecc20a0cb42d82c24d018d099773221347fd7cd8168c203c8dca7168916a81975d588181b64550b829a031e1724e64049d0d8fc58d435dd33d0bc7f528eb780a2c4679786fa36e662fdf079ac1770a0e3a1b1e8b1b87baa67b168eeb51d6f114588cf2f0de46ddcc5ebe0f3483ef141c38eae7c3b66004e169548e438b540bbcecc20a0cb42d82c24d018d099773221347fd7cd8168c203c8dca7168916a81975d588181b64550b829a031e1724e6404")

    G1 = [1, 2, 1]
    G1_2 = [
        1368015179489954701390400359078579693043519447331113978918064868415326638035,
        9918110051302171585080402603319702774565515993150576347155970296011118125764,
        1]
    G2 = [[10857046999023057135944570762232829481370756359578518086990519993285655852781,
           11559732032986387107991004021392285783925812861821192530917403151452391805634],
          [8495653923123431417604973247489272438418190587263600148770280649306958101930,
           4082367875863433681332203403145435568316851327593401208105741076214120093531],
          [1, 0]]
    INF1 = [0, 1, 0]

    @property
    def expected(self):
        return {
            "protocol": "groth", "nVars": 3, "nPublic": 1, "domainSize": 2,
            "vk_alfa_1": self.G1, "vk_beta_1": self.G1_2,
            "vk_delta_1": self.G1,
            "vk_beta_2": self.G2, "vk_delta_2": self.G2,
            "polsA": [{"0": 1}, {}, {"0": 7, "1": 5}],
            "polsB": [{}, {"1": 3}, {}],
            "A": [self.G1, self.G1_2, self.G1],
            "B1": [self.G1_2, self.G1, self.G1_2],
            "B2": [self.G2, self.G2, self.G2],
            "C": [self.INF1, self.INF1, self.G1_2],
            "hExps": [self.G1, self.G1_2],
        }

    def test_parser_decodes_golden_bytes(self):
        got = io.parse_websnark_proving_key(bytes.fromhex(self.FIXTURE_HEX))
        exp = self.expected
        assert got["nVars"] == 3 and got["nPublic"] == 1
        assert got["domainSize"] == 2
        for k in ("vk_alfa_1", "vk_beta_1", "vk_delta_1", "vk_beta_2",
                  "vk_delta_2", "A", "B1", "B2", "C", "hExps"):
            assert got[k] == exp[k], k
        # poly dicts compare by content (key order irrelevant to ==)
        assert got["polsA"] == exp["polsA"]
        assert got["polsB"] == exp["polsB"]

    def test_writer_reproduces_golden_bytes(self):
        assert io.binarify_proving_key(self.expected).hex() == self.FIXTURE_HEX

    def test_witness_golden_bytes(self):
        # binarifyWitness (binarify.ts:10-48): 32-byte LE limbs in order
        w = [1, 0, 2 ** 255 - 19]
        exp = (b"\x01" + b"\x00" * 31 + b"\x00" * 32
               + ((2 ** 255 - 19) % FR_MOD).to_bytes(32, "little"))
        assert io.binarify_witness(w) == exp
        assert io.parse_websnark_witness(exp) == [x % FR_MOD for x in w]


class TestCircom035Fixture:
    """VERDICT r4 #8: drive circom_loader -> setup -> prove -> verify from
    a fixture in the EXACT circom 0.0.35 compiled-output schema (all keys
    the JS compiler emits — mainCode/signalName2Idx/components/signals/
    templates/... — not just the constraint subset). The fixture is
    hand-authored (circom cannot run in this environment) for the
    two-constraint Multiplier circuit documented inside it; constraint
    semantics A*B = C per snarkjs 0.1.20's Circuit class."""

    FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                           "circom035_multiplier.json")

    def test_load_shape(self):
        from zkrollup.r1cs.circom_loader import load_circom_json
        r1 = load_circom_json(self.FIXTURE)
        assert r1.n_vars == 6
        assert r1.n_outputs == 1 and r1.n_public_inputs == 1
        assert r1.n_public == 3
        assert r1.n_constraints == 2
        # foreign keys (mainCode, templates, signals metadata) must be
        # tolerated, constraint coeffs parsed from decimal strings
        a, b, c = r1.constraints[0]
        assert a == {3: 1} and b == {4: 1} and c == {5: 1}

    def test_setup_prove_verify_from_fixture(self):
        from zkrollup.native import engine
        from zkrollup.r1cs.circom_loader import load_circom_json
        from zkrollup.groth16.setup import setup
        from zkrollup.groth16.prove import prove
        from zkrollup.groth16.verify import verify
        r1 = load_circom_json(self.FIXTURE)
        # witness in circom signal order: [1, d, c, a, b, inter]
        a_v, b_v, c_v = 3, 4, 10
        wit = [1, a_v * b_v + c_v, c_v, a_v, b_v, a_v * b_v]
        # satisfaction under the loaded system
        from zkrollup.ref.bn254 import R as P
        for (A, B, C) in r1.constraints:
            ev = lambda lc: sum(co * wit[k] for k, co in lc.items()) % P
            assert ev(A) * ev(B) % P == ev(C)
        pk = setup(r1, seed=b"circom-fixture")
        backend = "host" if engine.available() else None
        proof = prove(pk, r1, wit, r=5, s=7, backend=backend)
        assert verify(pk.vk, proof, wit[1:3])
        # tampered public signal rejected
        assert not verify(pk.vk, proof, [wit[1] + 1, wit[2]])
