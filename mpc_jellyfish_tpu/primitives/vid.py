"""VID: ADVZ verifiable information dispersal.

Mirror of `primitives/src/vid/advz.rs:65-279` (SURVEY.md §2.3): the payload
is encoded into field elements, split into `payload_chunk_size`-coefficient
polynomials, each KZG-committed; storage node i receives the evaluations of
every polynomial at domain point w^i plus ONE aggregated KZG opening proof
(random-combiner aggregation of the polynomials).  Any
`payload_chunk_size` shares recover the payload (Reed-Solomon).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import CurveSpec
from ..ops import ntt as N
from ..ops import field as F
from ..ops import poly as P
from ..pcs import kzg
from ..utils.conversion import bytes_to_field_elements, bytes_from_field_elements
from ..utils.keccak import keccak256
from ..utils.serialize import g1_to_bytes
from ..utils.ec_host import AffinePoint, ec_add, ec_mul


@dataclass
class VidCommon:
    """Common data broadcast to all nodes (advz.rs `Common`)."""
    poly_comms: list
    num_elems: int


@dataclass
class VidShare:
    """Per-storage-node share (advz.rs `Share`)."""
    index: int
    evals: list           # one eval per polynomial
    aggregate_proof: AffinePoint


class Advz:
    """GenericAdvz instantiation over one curve + KZG."""

    def __init__(self, curve: CurveSpec, srs, num_storage_nodes: int,
                 payload_chunk_size: int):
        assert payload_chunk_size <= num_storage_nodes
        self.curve = curve
        self.spec = curve.fr
        self.k = payload_chunk_size
        self.n_nodes = num_storage_nodes
        n = 1 << max(1, (num_storage_nodes - 1).bit_length())
        self.domain = N.Domain(self.spec, n)
        self.ck, self.vk = srs.trim(max(payload_chunk_size, 2))

    # -- helpers ----------------------------------------------------------
    def _polys_from_payload(self, payload: bytes) -> list:
        elems = bytes_to_field_elements(self.spec.p, payload)
        chunks = [elems[i:i + self.k] for i in range(0, len(elems), self.k)]
        chunks[-1] += [0] * (self.k - len(chunks[-1]))
        return chunks, len(elems)

    def _commit_polys(self, chunks) -> list:
        return kzg.commit_batch(
            self.ck, [self.spec.to_device(c) for c in chunks])

    def _pseudorandom_r(self, comms) -> int:
        data = b"".join(g1_to_bytes(self.curve, c) for c in comms)
        return int.from_bytes(keccak256(b"advz-r" + data), "little") % self.spec.p

    def commit_only(self, payload: bytes) -> bytes:
        """Hash of the polynomial commitments (advz.rs commit_only)."""
        chunks, _ = self._polys_from_payload(payload)
        comms = self._commit_polys(chunks)
        return keccak256(b"".join(g1_to_bytes(self.curve, c) for c in comms))

    # -- dispersal --------------------------------------------------------
    def disperse(self, payload: bytes):
        spec = self.spec
        p = spec.p
        chunks, num_elems = self._polys_from_payload(payload)
        comms = self._commit_polys(chunks)
        r = self._pseudorandom_r(comms)

        # evaluations of every poly at all node points (device NTT)
        n = self.domain.n
        evals_per_poly = []
        for c in chunks:
            padded = c + [0] * (n - len(c))
            evals_per_poly.append(spec.from_device(
                N.ntt(self.domain, spec.to_device(padded))))

        # aggregate polynomial sum_j r^j poly_j; one opening per node
        agg = [0] * self.k
        rj = 1
        for c in chunks:
            for t, coeff in enumerate(c):
                agg[t] = (agg[t] + rj * coeff) % p
            rj = rj * r % p
        agg_dev = spec.to_device(agg)
        # FK23 amortized openings at all node points (reference advz.rs
        # `multi_open_rou`, pcs/mod.rs:281): O(k log k) group ops instead of
        # one quotient MSM per storage node.
        proofs, _ = kzg.multi_open_rou(self.ck, agg_dev, self.n_nodes,
                                       self.domain)
        shares = []
        for i in range(self.n_nodes):
            shares.append(VidShare(
                index=i,
                evals=[evals_per_poly[j][i] for j in range(len(chunks))],
                aggregate_proof=proofs[i],
            ))
        return shares, VidCommon(poly_comms=comms, num_elems=num_elems)

    # -- verification -----------------------------------------------------
    def verify_share(self, share: VidShare, common: VidCommon) -> bool:
        p = self.spec.p
        r = self._pseudorandom_r(common.poly_comms)
        # aggregated commitment and evaluation
        agg_comm = AffinePoint.infinity()
        agg_eval = 0
        rj = 1
        for comm, ev in zip(common.poly_comms, share.evals):
            agg_comm = ec_add(self.curve.fq.p, agg_comm,
                              ec_mul(self.curve.fq.p, comm, rj))
            agg_eval = (agg_eval + rj * ev) % p
            rj = rj * r % p
        pt = self.domain.elements_host[share.index]
        return kzg.verify_open(self.vk, agg_comm, pt, agg_eval,
                               share.aggregate_proof)

    # -- recovery ---------------------------------------------------------
    def recover_payload(self, shares: list, common: VidCommon) -> bytes:
        from .reed_solomon import rs_decode
        p = self.spec.p
        use = shares[:self.k]
        n_polys = len(common.poly_comms)
        elems = []
        polys = []
        for j in range(n_polys):
            pts = [(self.domain.elements_host[s.index], s.evals[j]) for s in use]
            polys.append(rs_decode(p, pts, self.k))
        for poly in polys:
            elems.extend(poly)
        return bytes_from_field_elements(p, elems[:common.num_elems])
