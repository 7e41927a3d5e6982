#!/usr/bin/env python3
"""Encrypted-PDF fixture generator: an INDEPENDENT implementation of
the PDF standard security handler (ISO 32000-1 §7.6 / 32000-2 §7.6.4)
in python, producing documents the Scala PdfCrypt must open with the
EMPTY user password — R3 (RC4-128), R4 (AESV2) and R6 (AES-256), plus
one genuinely password-protected file that must be rejected by name.

Content lines follow a formula mirrored in the q_pdf_encrypted oracle:
  line(k, i) = "enc{k} line{i} w{(k*7+i*3)%50}"   for i in 0..(8+k)
"""
import hashlib
import os
import struct
import sys
import zlib

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "pdf_enc")

PAD = bytes([0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00,
             0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6,
             0xD0, 0x68, 0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53,
             0x69, 0x7A])


def rc4(key, data):
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    x = y = 0
    for c in data:
        x = (x + 1) & 0xFF
        y = (y + s[x]) & 0xFF
        s[x], s[y] = s[y], s[x]
        out.append(c ^ s[(s[x] + s[y]) & 0xFF])
    return bytes(out)


def aes_cbc_enc(key, iv, data):
    c = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return c.update(data) + c.finalize()


def aes_cbc_dec(key, iv, data):
    c = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    return c.update(data) + c.finalize()


def det_bytes(n, salt):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"fixture-{salt}-{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


def pad_pw(pw):
    return (pw + PAD)[:32]


# --- R3 / R4 key machinery (Algorithms 2, 3, 4/5) ---------------------

def compute_o(owner_pw, user_pw, r, n):
    h = hashlib.md5(pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    o = pad_pw(user_pw)
    o = rc4(key, o)
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def file_key(user_pw, o, p, id0, r, n, v4_nometa=False):
    m = hashlib.md5()
    m.update(pad_pw(user_pw))
    m.update(o[:32])
    m.update(struct.pack("<i", p))
    m.update(id0)
    if v4_nometa:
        m.update(b"\xff\xff\xff\xff")
    key = m.digest()[:n]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()[:n]
    return key


def compute_u(key, id0, r):
    if r == 2:
        return rc4(key, PAD)
    x = hashlib.md5(PAD + id0).digest()
    x = rc4(key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + det_bytes(16, "upad")  # 16 arbitrary padding bytes


def object_key(key, num, gen, aes):
    m = hashlib.md5()
    m.update(key)
    m.update(bytes([num & 0xFF, (num >> 8) & 0xFF, (num >> 16) & 0xFF,
                    gen & 0xFF, (gen >> 8) & 0xFF]))
    if aes:
        m.update(b"sAlT")
    return m.digest()[:min(len(key) + 5, 16)]


def enc_rc4(key, num, gen, data):
    return rc4(object_key(key, num, gen, False), data)


def enc_aes(key, num, gen, data, salt, v3=False):
    k = key if v3 else object_key(key, num, gen, True)
    iv = det_bytes(16, f"iv-{salt}-{num}")
    padlen = 16 - (len(data) % 16)
    return iv + aes_cbc_enc(k, iv, data + bytes([padlen]) * padlen)


# --- R6 (Algorithm 2.A / 2.B) -----------------------------------------

def hash_2b(pw, salt, udata):
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    last_e = 0
    while i < 64 or last_e > i - 32:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_enc(k[:16], k[16:32], k1)
        s = sum(e[:16]) % 3
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][s](e).digest()
        last_e = e[-1]
        i += 1
    return k[:32]


def r6_entries(user_pw, file_k):
    v_salt = det_bytes(8, "vs")
    k_salt = det_bytes(8, "ks")
    u_hash = hash_2b(user_pw, v_salt, b"")
    u = u_hash + v_salt + k_salt
    ik = hash_2b(user_pw, k_salt, b"")
    ue = aes_cbc_enc(ik, bytes(16), file_k)
    # owner entries computed against U (owner pw "owner")
    ov = det_bytes(8, "ovs")
    ok_salt = det_bytes(8, "oks")
    o_hash = hash_2b(b"owner", ov, u)
    o = o_hash + ov + ok_salt
    oik = hash_2b(b"owner", ok_salt, u)
    oe = aes_cbc_enc(oik, bytes(16), file_k)
    return u, ue, o, oe


# --- minimal classic PDF writer ---------------------------------------

def line(k, i):
    return f"enc{k} line{i} w{(k * 7 + i * 3) % 50}"


def content_stream(k):
    ops = ["BT /F1 12 Tf 72 720 Td 14 TL"]
    for i in range(8 + k):
        t = line(k, i).replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"({t}) Tj T*")
    ops.append("ET")
    return " ".join(ops).encode("latin-1")


def build_pdf(k, enc_string, enc_stream, encrypt_dict, id0):
    """Objects: 1 catalog, 2 pages, 3 page, 4 content, 5 font, 6 encrypt."""
    content = zlib.compress(content_stream(k))
    content = enc_stream(4, 0, content)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        4: b"<< /Length " + str(len(content)).encode() +
           b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: encrypt_dict,
    }
    out = bytearray(b"%PDF-1.7\n")
    offs = {}
    for num in sorted(objs):
        offs[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in sorted(objs):
        out += f"{offs[num]:010d} 00000 n \n".encode()
    idhex = id0.hex().encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode() +
            b" /Root 1 0 R /Encrypt 6 0 R /ID [<" + idhex + b"> <" +
            idhex + b">] >>\nstartxref\n" + str(xref).encode() +
            b"\n%%EOF\n")
    return bytes(out)


def pdfstr(b):
    return b"<" + b.hex().encode() + b">"


def make_r3(k, user_pw=b""):
    id0 = det_bytes(16, f"id-{k}")
    p = -44
    n = 16
    o = compute_o(b"owner", user_pw, 3, n)
    key = file_key(user_pw, o, p, id0, 3, n)
    u = compute_u(key, id0, 3)
    enc = (b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P " +
           str(p).encode() + b" /O " + pdfstr(o) + b" /U " + pdfstr(u) +
           b" >>")
    return build_pdf(k, None, lambda n_, g, d: enc_rc4(key, n_, g, d),
                     enc, id0)


def make_r4_aes(k):
    id0 = det_bytes(16, f"id-{k}")
    p = -44
    n = 16
    o = compute_o(b"owner", b"", 4, n)
    key = file_key(b"", o, p, id0, 4, n)
    u = compute_u(key, id0, 4)
    enc = (b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P " +
           str(p).encode() + b" /O " + pdfstr(o) + b" /U " + pdfstr(u) +
           b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >>"
           b" /StmF /StdCF /StrF /StdCF >>")
    return build_pdf(k, None,
                     lambda n_, g, d: enc_aes(key, n_, g, d, k),
                     enc, id0)


def make_r6(k):
    id0 = det_bytes(16, f"id-{k}")
    p = -44
    file_k = det_bytes(32, f"fk-{k}")
    u, ue, o, oe = r6_entries(b"", file_k)
    perms = aes_cbc_enc(file_k, bytes(16),
                        struct.pack("<i", p) + b"\xff\xff\xff\xffTadb" +
                        det_bytes(4, "pr"))
    enc = (b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P " +
           str(p).encode() +
           b" /O " + pdfstr(o) + b" /U " + pdfstr(u) +
           b" /OE " + pdfstr(oe) + b" /UE " + pdfstr(ue) +
           b" /Perms " + pdfstr(perms) +
           b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >>"
           b" /StmF /StdCF /StrF /StdCF >>")
    return build_pdf(k, None,
                     lambda n_, g, d: enc_aes(file_k, n_, g, d, k, v3=True),
                     enc, id0)


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "fixture_r3.pdf"), "wb") as f:
        f.write(make_r3(0))
    with open(os.path.join(OUT, "fixture_r4aes.pdf"), "wb") as f:
        f.write(make_r4_aes(1))
    with open(os.path.join(OUT, "fixture_r6.pdf"), "wb") as f:
        f.write(make_r6(2))
    # a genuinely password-protected document (user pw "secret"):
    # opening with the empty password must fail loudly by name
    with open(os.path.join(OUT, "fixture_locked.pdf"), "wb") as f:
        f.write(make_r3(3, user_pw=b"secret"))
    for n in os.listdir(OUT):
        print(n, os.path.getsize(os.path.join(OUT, n)))


if __name__ == "__main__":
    sys.exit(main())
