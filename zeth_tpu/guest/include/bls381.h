/* BLS12-381 for the EIP-4844 KZG point-evaluation precompile (0x0a).
 *
 * Guest-side mirror of the host engine's zeth_tpu/app/bls12381.py +
 * app/kzg.py. All 381-bit modular multiplies run on the (384-bit wide)
 * SYS_BIGINT accelerator. */
#ifndef ZETH_BLS381_H
#define ZETH_BLS381_H

#include <stdint.h>

/* verify_kzg_proof(commitment, z, y, proof) against the provisioned
 * [tau]_2 setup point (4 x 12 little-endian u32 limbs: x.c0 x.c1 y.c0
 * y.c1). z/y are 32-byte big-endian scalars. Returns 1 (valid),
 * 0 (invalid proof), -1 (malformed input: bad point encoding, scalar
 * out of range). */
int bls_kzg_verify(const uint8_t commitment[48], const uint8_t z_be[32],
                   const uint8_t y_be[32], const uint8_t proof[48],
                   const uint32_t setup_g2[48]);

#endif
