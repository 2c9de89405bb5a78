"""STARK proving framework: AIRs, FRI, prover/verifier.

The TPU-native replacement for the dense proving cores the reference vendors
through risc0-zkvm / sp1-sdk (SURVEY.md §2.2, §7 step 6): trace LDE via
BabyBear NTT, Poseidon2 Merkle commitments, DEEP-ALI quotienting and FRI
low-degree testing — prover compute on TPU, verifier host-side.
"""
