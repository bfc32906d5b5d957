"""Parquet Modular Encryption tests.

Covers the reference surface (parquet/encryption_properties.go,
internal/encryption/): uniform + per-column keys, encrypted + plaintext
footer, AES_GCM_V1 + AES_GCM_CTR_V1, AAD prefixes, key retrievers, key
management tools (PKMT1) — with pyarrow as the cross-implementation
oracle in both directions.
"""
import base64
import io
import os

import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import parquet as pq
from arrow_go_tpu.parquet import keytools as kt

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as papq  # noqa: E402
import pyarrow.parquet.encryption as pe  # noqa: E402
from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # noqa: E402

KEY = b"0123456789012345"
COLKEY = b"abcdefghabcdefgh"
MASTER_KEYS = {"kf": KEY, "kc1": b"1234567890123450",
               "kc2": b"2345678901234501"}


def _table():
    return agt.table({"a": list(range(800)),
                      "s": [f"v{i % 37}" for i in range(800)],
                      "f": [float(i) * 0.5 if i % 9 else None
                            for i in range(800)]})


def _wrap(key_bytes, mid):
    nonce = os.urandom(12)
    ct = AESGCM(MASTER_KEYS[mid]).encrypt(nonce, bytes(key_bytes), b"")
    return base64.b64encode(nonce + ct).decode()


def _unwrap(wrapped, mid):
    raw = base64.b64decode(wrapped)
    return AESGCM(MASTER_KEYS[mid]).decrypt(raw[:12], raw[12:], b"")


class _PyKms(pe.KmsClient):
    def __init__(self, config):
        pe.KmsClient.__init__(self)

    def wrap_key(self, k, m):
        return _wrap(k, m)

    def unwrap_key(self, w, m):
        return _unwrap(w, m)


class _OurKms(kt.KmsClient):
    def wrap_key(self, k, m):
        return _wrap(k, m)

    def unwrap_key(self, w, m):
        return _unwrap(w, m)


def test_uniform_encrypted_footer_roundtrip():
    t = _table()
    enc = pq.FileEncryptionProperties(footer_key=KEY, footer_key_metadata=b"kf")
    buf = io.BytesIO()
    pq.write_table(t, buf, encryption=enc)
    data = buf.getvalue()
    assert data[:4] == b"PARE" and data[-4:] == b"PARE"
    got = pq.read_table(data,
                        decryption=pq.FileDecryptionProperties(footer_key=KEY))
    assert got.to_pydict() == t.to_pydict()
    with pytest.raises(Exception):
        pq.read_table(data)  # no keys
    with pytest.raises(Exception):
        pq.read_table(data, decryption=pq.FileDecryptionProperties(
            footer_key=b"X" * 16))  # wrong key


def test_column_keys_and_plaintext_column():
    t = _table()
    enc = pq.FileEncryptionProperties(
        footer_key=KEY, column_keys={"s": COLKEY, "f": COLKEY})
    buf = io.BytesIO()
    pq.write_table(t, buf, encryption=enc)
    dec = pq.FileDecryptionProperties(footer_key=KEY,
                                      column_keys={"s": COLKEY, "f": COLKEY})
    assert pq.read_table(buf.getvalue(), decryption=dec).to_pydict() \
        == t.to_pydict()


def test_plaintext_footer_partial_access():
    t = _table()
    enc = pq.FileEncryptionProperties(footer_key=KEY,
                                      column_keys={"s": COLKEY},
                                      plaintext_footer=True)
    buf = io.BytesIO()
    pq.write_table(t, buf, encryption=enc)
    data = buf.getvalue()
    assert data[:4] == b"PAR1" and data[-4:] == b"PAR1"
    # metadata + plaintext columns readable without any keys
    pf = pq.ParquetFile(data)
    assert pf.num_rows == 800
    assert pf.read_table(columns=["a"]).column("a").to_pylist() \
        == list(range(800))
    with pytest.raises(Exception):
        pf.read_table(columns=["s"])
    dec = pq.FileDecryptionProperties(footer_key=KEY, column_keys={"s": COLKEY})
    assert pq.read_table(data, decryption=dec).to_pydict() == t.to_pydict()


def test_gcm_ctr_aad_prefix_and_retriever():
    t = _table()
    enc = pq.FileEncryptionProperties(
        footer_key=KEY, footer_key_metadata=b"kf",
        column_keys={"s": pq.ColumnEncryptionProperties(COLKEY, b"ks")},
        algorithm="AES_GCM_CTR_V1", aad_prefix=b"file-id-1")
    buf = io.BytesIO()
    pq.write_table(t, buf, data_page_size=1024, encryption=enc)
    keys = {b"kf": KEY, b"ks": COLKEY}
    dec = pq.FileDecryptionProperties(
        key_retriever=lambda km: keys[bytes(km)])
    assert pq.read_table(buf.getvalue(), decryption=dec).to_pydict() \
        == t.to_pydict()


def test_supplied_aad_prefix():
    t = _table()
    enc = pq.FileEncryptionProperties(footer_key=KEY, aad_prefix=b"secret",
                                      store_aad_prefix=False)
    buf = io.BytesIO()
    pq.write_table(t, buf, encryption=enc)
    with pytest.raises(Exception):
        pq.read_table(buf.getvalue(),
                      decryption=pq.FileDecryptionProperties(footer_key=KEY))
    assert pq.read_table(buf.getvalue(), decryption=pq.FileDecryptionProperties(
        footer_key=KEY, aad_prefix=b"secret")).to_pydict() == t.to_pydict()


def test_encrypted_bloom_and_page_index():
    t = _table()
    enc = pq.FileEncryptionProperties(footer_key=KEY)
    buf = io.BytesIO()
    pq.write_table(t, buf, encryption=enc, write_bloom_filters=True)
    pf = pq.ParquetFile(buf.getvalue(),
                        decryption=pq.FileDecryptionProperties(footer_key=KEY))
    from arrow_go_tpu.parquet import format as fmt
    bf = pf.read_bloom_filter(0, 1)
    assert bf is not None and bf.check(b"v5", fmt.Type.BYTE_ARRAY)
    assert pf.read_column_index(0, 0) is not None
    assert pf.read_offset_index(0, 0) is not None


@pytest.mark.parametrize("double_wrapping", [True, False])
@pytest.mark.parametrize("plaintext_footer", [False, True])
def test_keytools_interop_with_pyarrow(double_wrapping, plaintext_footer):
    """PKMT1 envelope interop: pyarrow-encrypted files decrypt with our
    CryptoFactory and vice versa."""
    table = pa.table(_table().to_pydict())
    cf = pe.CryptoFactory(lambda c: _PyKms(c))
    kcfg = pe.KmsConnectionConfig()
    ours = kt.CryptoFactory(lambda cfg: _OurKms())

    fep = cf.file_encryption_properties(kcfg, pe.EncryptionConfiguration(
        footer_key="kf", column_keys={"kc1": ["a"], "kc2": ["s"]},
        double_wrapping=double_wrapping, plaintext_footer=plaintext_footer))
    buf = io.BytesIO()
    with papq.ParquetWriter(buf, table.schema, encryption_properties=fep) as w:
        w.write_table(table)
    got = pq.read_table(buf.getvalue(),
                        decryption=ours.file_decryption_properties(
                            kt.KmsConnectionConfig()))
    assert got.to_pydict() == table.to_pydict()

    eprops = ours.file_encryption_properties(
        kt.KmsConnectionConfig(),
        kt.EncryptionConfiguration(footer_key="kf",
                                   column_keys={"kc1": ["a"], "kc2": ["s"]},
                                   double_wrapping=double_wrapping,
                                   plaintext_footer=plaintext_footer))
    buf2 = io.BytesIO()
    pq.write_table(agt.table(table.to_pydict()), buf2, data_page_size=4096,
                   encryption=eprops)
    pt = papq.read_table(
        io.BytesIO(buf2.getvalue()),
        decryption_properties=cf.file_decryption_properties(
            kcfg, pe.DecryptionConfiguration()))
    assert pt.to_pydict() == table.to_pydict()


def test_keytools_uniform_both_directions():
    table = pa.table(_table().to_pydict())
    cf = pe.CryptoFactory(lambda c: _PyKms(c))
    kcfg = pe.KmsConnectionConfig()
    ours = kt.CryptoFactory(lambda cfg: _OurKms())
    fep = cf.file_encryption_properties(kcfg, pe.EncryptionConfiguration(
        footer_key="kf", uniform_encryption=True))
    buf = io.BytesIO()
    with papq.ParquetWriter(buf, table.schema, encryption_properties=fep) as w:
        w.write_table(table)
    assert pq.read_table(
        buf.getvalue(), decryption=ours.file_decryption_properties(
            kt.KmsConnectionConfig())).to_pydict() == table.to_pydict()
    eprops = ours.file_encryption_properties(
        kt.KmsConnectionConfig(),
        kt.EncryptionConfiguration(footer_key="kf", uniform_encryption=True))
    buf2 = io.BytesIO()
    pq.write_table(agt.table(table.to_pydict()), buf2, encryption=eprops)
    assert papq.read_table(
        io.BytesIO(buf2.getvalue()),
        decryption_properties=cf.file_decryption_properties(
            kcfg, pe.DecryptionConfiguration())).to_pydict() \
        == table.to_pydict()


def test_encrypted_multi_row_group_and_seek():
    t = agt.table({"x": list(range(5000))})
    enc = pq.FileEncryptionProperties(footer_key=KEY)
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=1500, data_page_size=2048,
                   encryption=enc)
    pf = pq.ParquetFile(buf.getvalue(),
                        decryption=pq.FileDecryptionProperties(footer_key=KEY))
    assert pf.read_table().column("x").to_pylist() == list(range(5000))
    assert pf.read_rows(2900, 300).column("x").to_pylist() \
        == list(range(2900, 3200))
