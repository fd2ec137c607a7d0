"""Per-chunk AES-256-GCM encryption with RSA-OAEP envelope key wrapping.

Parity:
- ``transform/EncryptionChunkEnumeration.java:30-85`` — fresh cipher per
  chunk, 12-byte random IV prepended to each encrypted chunk, one DEK +
  AAD per segment;
- ``security/AesEncryptionProvider.java:34-98`` — AES-256 DEK; the AAD is
  itself a generated 256-bit key's bytes (SURVEY.md §7.4.2);
- ``security/RsaEncryptionProvider.java:37-102`` — DEK wrapped with the
  active RSA KEK (OAEP), keyring by KEK id for rotation; serialized as
  'kekId:base64(ciphertext)'.

GCM adds a 16-byte tag, so encrypted chunk size = plain + 12 (IV) + 16 —
deterministic, which is what lets the pipeline keep a *fixed-size* chunk
index when encrypting without compressing.
"""

from __future__ import annotations

import base64
import os
from typing import Iterator

from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import padding, rsa
from cryptography.hazmat.primitives.ciphers.aead import AESGCM

IV_SIZE = 12
TAG_SIZE = 16
ENCRYPTION_OVERHEAD = IV_SIZE + TAG_SIZE
KEY_SIZE = 32  # AES-256


class DataKeyAndAAD:
    def __init__(self, data_key: bytes, aad: bytes):
        self.data_key = data_key
        self.aad = aad


def create_data_key_and_aad() -> DataKeyAndAAD:
    return DataKeyAndAAD(AESGCM.generate_key(256), AESGCM.generate_key(256))


def encrypt_chunks(chunks: Iterator[bytes], key: DataKeyAndAAD) -> Iterator[bytes]:
    aes = AESGCM(key.data_key)
    for chunk in chunks:
        iv = os.urandom(IV_SIZE)
        yield iv + aes.encrypt(iv, chunk, key.aad)


def decrypt_chunks(chunks: Iterator[bytes], key: DataKeyAndAAD) -> Iterator[bytes]:
    aes = AESGCM(key.data_key)
    for chunk in chunks:
        iv, ct = chunk[:IV_SIZE], chunk[IV_SIZE:]
        yield aes.decrypt(iv, ct, key.aad)


class RsaKeyring:
    """KEK keyring: wraps DEKs with the active KEK, unwraps with any held
    KEK (rotation = add new active, keep old for reads)."""

    _PAD = padding.OAEP(
        mgf=padding.MGF1(algorithm=hashes.SHA512()),
        algorithm=hashes.SHA512(),
        label=None,
    )

    def __init__(self, active_kek_id: str, keys: dict[str, rsa.RSAPrivateKey]):
        if active_kek_id not in keys:
            raise KeyError(f"active KEK {active_kek_id!r} not in keyring")
        self.active_kek_id = active_kek_id
        self._keys = dict(keys)

    @classmethod
    def generate(cls, kek_id: str = "kek-0") -> "RsaKeyring":
        return cls(kek_id, {kek_id: rsa.generate_private_key(65537, 2048)})

    def add_kek(self, kek_id: str, key: rsa.RSAPrivateKey, make_active: bool = True) -> None:
        self._keys[kek_id] = key
        if make_active:
            self.active_kek_id = kek_id

    def wrap(self, dek: bytes) -> str:
        ct = self._keys[self.active_kek_id].public_key().encrypt(dek, self._PAD)
        return f"{self.active_kek_id}:{base64.b64encode(ct).decode('ascii')}"

    def unwrap(self, wrapped: str) -> bytes:
        kek_id, _, b64 = wrapped.partition(":")
        if kek_id not in self._keys:
            raise KeyError(f"unknown KEK id {kek_id!r}")
        return self._keys[kek_id].decrypt(base64.b64decode(b64), self._PAD)

    def serialize_private(self, kek_id: str) -> bytes:
        return self._keys[kek_id].private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        )
