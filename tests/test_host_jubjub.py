"""Baby-JubJub / Pedersen / EdDSA / Merkle host-layer tests.

Vectors pinned from the reference suite:
 - /root/reference/test/test_jubjub.py (point A, its double)
 - /root/reference/test/test_pedersen.py (hash_scalars/bytes/bits knowns)
 - /root/reference/test/test_eddsa.py (C++-compatible signature vectors)
 - /root/reference/test/test_merkle.py (known roots, uniques, IVs)
"""
import unittest
from os import urandom

from ethsnarks_tpu.field import FQ
from ethsnarks_tpu.jubjub import (
    Point, JUBJUB_L, mult_naf, mult_naf_lut)
from ethsnarks_tpu.pedersen import (
    pedersen_hash_bytes, pedersen_hash_scalars)
from ethsnarks_tpu.eddsa import EdDSA, PureEdDSA, MiMCEdDSA
from ethsnarks_tpu.merkletree import MerkleTree, DEFAULT_HASHER, MerkleHasher_Poseidon


class TestJubjub(unittest.TestCase):
    def _point_a(self):
        x = 0x274dbce8d15179969bc0d49fa725bddf9de555e0ba6a693c6adb52fc9ee7a82c
        y = 0x5ce98c61b05f47fe2eae9a542bd99f6b2e78246231640b54595febfd51eb853
        return Point(FQ(x), FQ(y))

    def test_double_known(self):
        p = self._point_a()
        d = Point(
            FQ(6890855772600357754907169075114257697580319025794532037257385534741338397365),
            FQ(4338620300185947561074059802482547481416142213883829469920100239455078257889))
        self.assertEqual(p.double(), d)
        self.assertEqual(p.as_etec().double().as_point(), d)
        self.assertEqual(p.as_proj().double().as_point(), d)

    def test_conversions(self):
        for _ in range(5):
            p = Point.from_hash(urandom(10))
            for q in [p.as_point(), p.as_etec(), p.as_proj(), p.as_mont()]:
                self.assertTrue(q.valid())
                self.assertEqual(q.as_point(), p)

    def test_mult_consistency(self):
        p = self._point_a()
        k = 0xbeef1234
        expected = p.mult(k)
        self.assertEqual((p.as_etec() * k).as_point(), expected)
        self.assertEqual((p.as_proj() * k).as_point(), expected)
        self.assertEqual(mult_naf(p.as_etec(), k).as_point(), expected)
        for w in (2, 3, 5):
            self.assertEqual(mult_naf_lut(p.as_etec(), k, w).as_point(), expected)

    def test_cofactor_and_order(self):
        g = Point.generator()
        self.assertTrue(g.valid())
        self.assertEqual(g * JUBJUB_L, Point.infinity())

    def test_compress_roundtrip(self):
        for _ in range(5):
            p = Point.from_hash(urandom(10))
            self.assertEqual(Point.decompress(p.compress()), p)


class TestPedersen(unittest.TestCase):
    def test_hash_scalars_known(self):
        self.assertEqual(
            pedersen_hash_scalars(b'test', 267),
            Point(FQ(6790798216812059804926342266703617627640027902964190490794793207272357201212),
                  FQ(2522797517250455013248440571887865304858084343310097011302610004060289809689)))
        self.assertEqual(
            pedersen_hash_scalars(b'test', 21888242871839275222246405745257275088548364400416034343698204186575808495616),
            Point(FQ(16322787121012335146141962340685388833598805940095898416175167744309692564601),
                  FQ(7671892447502767424995649701270280747270481283542925053047237428072257876309)))

    def test_hash_bytes_known(self):
        self.assertEqual(
            pedersen_hash_bytes(b'test', b"abc"),
            Point(FQ(9869277320722751484529016080276887338184240285836102740267608137843906399765),
                  FQ(19790690237145851554496394080496962351633528315779989340140084430077208474328)))
        self.assertEqual(
            pedersen_hash_bytes(b'test', b"abcdefghijklmnopqrstuvwx"),
            Point(FQ(3966548799068703226441887746390766667253943354008248106643296790753369303077),
                  FQ(12849086395963202120677663823933219043387904870880733726805962981354278512988)))


class TestEdDSA(unittest.TestCase):
    def test_signverify_roundtrip(self):
        B = Point.from_hash(b'eddsa_base')
        k, A = EdDSA.random_keypair()
        m = urandom(32)
        smsg = EdDSA.sign(m, k, B)
        self.assertTrue(EdDSA.verify(*smsg, B))
        smsg = PureEdDSA.sign(m, k, B)
        self.assertTrue(PureEdDSA.verify(*smsg, B))
        smsg = MiMCEdDSA.sign([1, 2, 3], k, B)
        self.assertTrue(MiMCEdDSA.verify(*smsg, B))

    def test_mimc_eddsa_known(self):
        A = Point(FQ(1301009284721359989986872336829887838687570550075011148323334415657243668534),
                  FQ(6027072831423449649615427623935115177649426117898838224822914942466592945166))
        R = Point(FQ(16697780772074863636681870538986108875460311579901354831891912949591301444465),
                  FQ(4226867824412371436973606126220323912943722787513450804471487686191426145939))
        s = 740212824778436527565151771778503009743408793780835234261147965780852431216
        self.assertTrue(MiMCEdDSA.verify(A, (R, s), [1, 2, 3]))

    def test_hash_eddsa_known(self):
        """Cross-implementation vector (C++ test_jubjub_eddsa.cpp)."""
        A = Point(FQ(333671881179914989291633188949569309119725676183802886621140166987382124337),
                  FQ(4050436616325076046600891135828313078248584449767955905006778857958871314574))
        R = Point(FQ(21473010389772475573783051334263374448039981396476357164143587141689900886674),
                  FQ(11330590229113935667895133446882512506792533479705847316689101265088791098646))
        s = 21807294168737929637405719327036335125520717961882955117047593281820367379946
        self.assertTrue(EdDSA.verify(A, (R, s), b'abc'))
        self.assertFalse(PureEdDSA.verify(A, (R, s), b'abc'))

    def test_pure_eddsa_known(self):
        A = Point(FQ(333671881179914989291633188949569309119725676183802886621140166987382124337),
                  FQ(4050436616325076046600891135828313078248584449767955905006778857958871314574))
        R = Point(FQ(17815983127755465894346158776246779862712623073638768513395595796132990361464),
                  FQ(947174453624106321442736396890323086851143728754269151257776508699019857364))
        s = 13341814865473145800030207090487687417599620847405735706082771659861699337012
        self.assertTrue(PureEdDSA.verify(A, (R, s), b'abcd'))
        self.assertFalse(EdDSA.verify(A, (R, s), b'abcd'))


class TestMerkleTree(unittest.TestCase):
    def test_known1(self):
        tree = MerkleTree(2)
        item_a = 3703141493535563179657531719960160174296085208671919316200479060314459804651
        item_b = 134551314051432487569247388144051420116740427803855572138106146683954151557
        tree.append(item_a)
        tree.append(item_b)
        self.assertEqual(
            tree.root,
            3075442268020138823380831368198734873612490112867968717790651410945045657947)
        self.assertEqual(tree.proof(0).path, [item_b])
        self.assertEqual(tree.proof(1).path, [item_a])

    def test_known_2pow28(self):
        tree = MerkleTree(2 << 28)
        item_a = 3703141493535563179657531719960160174296085208671919316200479060314459804651
        tree.append(item_a)
        self.assertEqual(
            tree.root,
            5635502254919888512883611961327385811173415612631829359029947885796109426800)
        item_b = 134551314051432487569247388144051420116740427803855572138106146683954151557
        tree.append(item_b)
        self.assertEqual(
            tree.root,
            14972246236048249827985830600768475898195156734731557762844426864943654467818)
        self.assertTrue(tree.proof(0).verify(tree.root))
        self.assertTrue(tree.proof(1).verify(tree.root))
        self.assertEqual(
            tree.leaf(2, 1),
            4832852105446597958495745596582249246190817345027389430471458078394903639834)
        self.assertEqual(
            tree.leaf(22, 1),
            16077039334695461958102978289003547153551663194787878097275872631374489043531)

    def test_uniques(self):
        hasher = DEFAULT_HASHER(29)
        self.assertEqual(
            hasher.unique(20, 20),
            6738165491478210350639451800403024427867073896603076888955948358229240057870)
        self.assertEqual(
            hasher.unique(0, 0),
            2544023609834722662089612003212769975105508295482723304413974529614913939747)

    def test_poseidon_hasher(self):
        tree = MerkleTree(4, width=2, hasher=MerkleHasher_Poseidon.factory())
        tree.append(FQ.random())
        tree.append(FQ.random())
        self.assertTrue(tree.proof(0).verify(tree.root))
        self.assertTrue(tree.proof(1).verify(tree.root))


if __name__ == "__main__":
    unittest.main()
