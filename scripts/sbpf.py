"""Minimal Solana sBPF interpreter — executes the reference's committed
on-chain verifier program offline.

The reference deploys its Groth16 audit verifier as a Solana BPF program
(``audit_circuit/target/audit_verifier.so``, CPI'd at
``submit_audit.rs:81-87``). No Solana runtime exists in this
environment, so this module implements just enough of the platform to
run that artifact: an ELF loader with Solana's BPF relocation handling,
the (e)BPF instruction set, the loader input ABI, and the handful of
syscalls the program imports (``.dynsym``: sol_log_, sol_memcpy_,
sol_memset_, sol_memcmp_, sol_panic_, abort, and
sol_alt_bn128_group_op — the BN254 group/pairing syscall, which we back
with ``tpu_zkpool.refimpl.pairing_ref``). Everything else — proof/VK
byte parsing, the bsb22 hash-to-field, the gamma-leg commitment fold,
the pairing-equation assembly — runs as the program's OWN compiled
gnark verifier logic.

Driven by ``scripts/bpf_verify_audit.py``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

MM_PROGRAM = 0x100000000
MM_STACK = 0x200000000
MM_HEAP = 0x300000000
MM_INPUT = 0x400000000

FRAME = 4096
STACK_FRAMES = 64

R_BPF_64_64 = 1
R_BPF_64_RELATIVE = 8
R_BPF_64_32 = 10


@dataclass
class Region:
    start: int
    data: bytearray
    writable: bool

    @property
    def end(self):
        return self.start + len(self.data)


class SbpfError(Exception):
    pass


@dataclass
class Program:
    elf: bytes
    text_off: int = 0
    text_size: int = 0
    entry_pc: int = 0
    # call-site instruction index -> target pc (int) or syscall name (str)
    call_map: dict = field(default_factory=dict)
    ro: bytearray = field(default_factory=bytearray)

    @property
    def n_insns(self):
        return self.text_size // 8


def load_program(elf: bytes) -> Program:
    assert elf[:4] == b"\x7fELF" and elf[4] == 2
    (e_shoff,) = struct.unpack("<Q", elf[40:48])
    e_shentsize, e_shnum, e_shstrndx = struct.unpack("<HHH", elf[58:64])
    secs = []
    for i in range(e_shnum):
        off = e_shoff + i * e_shentsize
        name, stype, flags, addr, offset, size, link, info, align, entsz = \
            struct.unpack("<IIQQQQIIQQ", elf[off:off + 64])
        secs.append(dict(name=name, type=stype, addr=addr, off=offset,
                         size=size, link=link))
    shstr = secs[e_shstrndx]

    def nm(sec):
        x = shstr["off"] + sec["name"]
        return elf[x:elf.index(b"\0", x)].decode()

    by_name = {nm(s): s for s in secs}
    text = by_name[".text"]
    prog = Program(elf=elf, text_off=text["off"], text_size=text["size"])
    # relocatable copy of the whole file mapped at MM_PROGRAM
    prog.ro = bytearray(elf)

    # dynamic symbols
    dynsym, dynstr = by_name[".dynsym"], by_name[".dynstr"]
    syms = []
    for i in range(dynsym["size"] // 24):
        off = dynsym["off"] + i * 24
        nameoff, info, other, shndx, value, size = struct.unpack(
            "<IBBHQQ", elf[off:off + 24])
        x = dynstr["off"] + nameoff
        syms.append((elf[x:elf.index(b"\0", x)].decode(), shndx, value))
    entry = [v for (n, sh, v) in syms if n == "entrypoint"]
    assert entry, "no entrypoint symbol"
    prog.entry_pc = (entry[0] - text["addr"]) // 8

    # relocations (Elf64_Rel, no addend)
    rel = by_name.get(".rel.dyn")
    if rel:
        for i in range(rel["size"] // 16):
            r_off, r_info = struct.unpack(
                "<QQ", elf[rel["off"] + i * 16: rel["off"] + i * 16 + 16])
            r_type = r_info & 0xFFFFFFFF
            r_sym = r_info >> 32
            if r_type == R_BPF_64_32:
                name, shndx, value = syms[r_sym]
                insn_idx = (r_off - text["addr"]) // 8
                if shndx == 0:
                    prog.call_map[insn_idx] = name          # syscall
                else:
                    prog.call_map[insn_idx] = (value - text["addr"]) // 8
            elif r_type == R_BPF_64_64:
                # lddw at r_off: imm pair <- MM_PROGRAM + sym + imm_lo
                name, shndx, value = syms[r_sym]
                lo = struct.unpack("<i", prog.ro[r_off + 4:r_off + 8])[0]
                addr = MM_PROGRAM + value + (lo & 0xFFFFFFFF)
                prog.ro[r_off + 4:r_off + 8] = struct.pack(
                    "<I", addr & 0xFFFFFFFF)
                prog.ro[r_off + 12:r_off + 16] = struct.pack(
                    "<I", (addr >> 32) & 0xFFFFFFFF)
            elif r_type == R_BPF_64_RELATIVE:
                if text["addr"] <= r_off < text["addr"] + text["size"]:
                    lo = struct.unpack(
                        "<I", prog.ro[r_off + 4:r_off + 8])[0]
                    hi = struct.unpack(
                        "<I", prog.ro[r_off + 12:r_off + 16])[0]
                    addr = ((hi << 32) | lo) + MM_PROGRAM
                    prog.ro[r_off + 4:r_off + 8] = struct.pack(
                        "<I", addr & 0xFFFFFFFF)
                    prog.ro[r_off + 12:r_off + 16] = struct.pack(
                        "<I", (addr >> 32) & 0xFFFFFFFF)
                else:
                    # rbpf quirk: outside .text the source address is a
                    # 32-bit LE value at r_off + 4 (the "imm" position);
                    # the fixup writes MM_PROGRAM + addr as a u64 at r_off
                    (val,) = struct.unpack(
                        "<I", prog.ro[r_off + 4:r_off + 8])
                    prog.ro[r_off:r_off + 8] = struct.pack(
                        "<Q", MM_PROGRAM + val)
            else:
                raise SbpfError(f"unhandled relocation type {r_type}")
    return prog


M64 = (1 << 64) - 1
M32 = (1 << 32) - 1


def _s64(v):
    v &= M64
    return v - (1 << 64) if v >> 63 else v


def _s32(v):
    v &= M32
    return v - (1 << 32) if v >> 31 else v


class Vm:
    def __init__(self, prog: Program, input_data: bytes, syscalls,
                 max_insns: int = 200_000_000):
        self.prog = prog
        self.regions = [
            Region(MM_PROGRAM, prog.ro, False),
            Region(MM_STACK, bytearray(FRAME * STACK_FRAMES * 2), True),
            Region(MM_HEAP, bytearray(32 * 1024), True),
            Region(MM_INPUT, bytearray(input_data), True),
        ]
        self.syscalls = syscalls
        self.max_insns = max_insns
        self.logs = []
        self.insn_count = 0
        self.trace = None          # set to a list to record (pc, op, regs)

    # ------------------------------------------------------------- memory

    def _region(self, addr, size):
        for r in self.regions:
            if r.start <= addr and addr + size <= r.end:
                return r
        raise SbpfError(f"bad access {hex(addr)} size {size} "
                        f"(insn {self.insn_count})")

    def load(self, addr, size):
        r = self._region(addr, size)
        off = addr - r.start
        return int.from_bytes(r.data[off:off + size], "little")

    def store(self, addr, size, val):
        r = self._region(addr, size)
        if not r.writable:
            raise SbpfError(f"write to RO {hex(addr)}")
        off = addr - r.start
        r.data[off:off + size] = (val & ((1 << (8 * size)) - 1)
                                  ).to_bytes(size, "little")

    def read_bytes(self, addr, n):
        r = self._region(addr, n)
        off = addr - r.start
        return bytes(r.data[off:off + n])

    def write_bytes(self, addr, data):
        r = self._region(addr, len(data))
        if not r.writable:
            raise SbpfError(f"write to RO {hex(addr)}")
        off = addr - r.start
        r.data[off:off + len(data)] = data

    # ---------------------------------------------------------------- run

    def run(self):
        prog = self.prog
        text = prog.ro
        toff = prog.text_off
        reg = [0] * 11
        reg[1] = MM_INPUT
        reg[2] = MM_INPUT  # unused
        depth = 0
        reg[10] = MM_STACK + FRAME
        pc = prog.entry_pc
        stack = []   # (return_pc, saved r6..r9, saved r10)
        n = prog.n_insns
        while True:
            if not (0 <= pc < n):
                raise SbpfError(f"pc out of range {pc}")
            self.insn_count += 1
            if self.insn_count > self.max_insns:
                raise SbpfError("instruction budget exceeded")
            o = toff + pc * 8
            op = text[o]
            if self.trace is not None:
                self.trace.append((pc, op, list(reg)))
                if len(self.trace) > 64:
                    self.trace.pop(0)
            dst = text[o + 1] & 0xF
            src = (text[o + 1] >> 4) & 0xF
            off = struct.unpack("<h", text[o + 2:o + 4])[0]
            imm = struct.unpack("<i", text[o + 4:o + 8])[0]
            cls = op & 0x07
            pc += 1
            if op == 0x18:                       # lddw
                imm2 = struct.unpack("<i", text[o + 12:o + 16])[0]
                reg[dst] = ((imm & M32) | ((imm2 & M32) << 32)) & M64
                pc += 1
                continue
            if cls in (0x04, 0x07):              # ALU32 / ALU64
                is64 = cls == 0x07
                b = reg[src] if (op & 0x08) else (imm & M64 if is64
                                                  else imm & M32)
                if not is64:
                    b &= M32
                a = reg[dst] if is64 else reg[dst] & M32
                code = op & 0xF0
                if code == 0x00:
                    r = a + b
                elif code == 0x10:
                    r = a - b
                elif code == 0x20:
                    r = a * b
                elif code == 0x30:
                    bb = b if is64 else b & M32
                    if bb == 0:
                        raise SbpfError("div by zero")
                    r = (a & M64) // bb if is64 else (a & M32) // bb
                elif code == 0x40:
                    r = a | b
                elif code == 0x50:
                    r = a & b
                elif code == 0x60:
                    r = a << (b & (63 if is64 else 31))
                elif code == 0x70:
                    r = (a & (M64 if is64 else M32)) >> (b & (63 if is64
                                                              else 31))
                elif code == 0x80:
                    # neg (imm form only)
                    r = (-a) & (M64 if is64 else M32)
                elif code == 0x90:
                    bb = b
                    if bb == 0:
                        raise SbpfError("mod by zero")
                    r = (a & (M64 if is64 else M32)) % bb
                elif code == 0xA0:
                    r = a ^ b
                elif code == 0xB0:
                    r = b
                elif code == 0xC0:
                    sa = _s64(a) if is64 else _s32(a)
                    r = sa >> (b & (63 if is64 else 31))
                elif code == 0xD0:               # endian
                    width = imm
                    v = reg[dst]
                    if op & 0x08:                # be
                        r = int.from_bytes(
                            (v & ((1 << width) - 1)).to_bytes(
                                width // 8, "little"), "big")
                    else:                        # le
                        r = v & ((1 << width) - 1)
                else:
                    raise SbpfError(f"bad alu op {hex(op)}")
                reg[dst] = r & M64 if is64 else r & M32
                continue
            if cls == 0x00:                      # LD (only lddw, above)
                raise SbpfError(f"bad ld op {hex(op)}")
            if cls == 0x01:                      # LDX
                size = {0x61: 4, 0x69: 2, 0x71: 1, 0x79: 8}[op]
                reg[dst] = self.load((reg[src] + off) & M64, size)
                continue
            if cls == 0x02:                      # ST imm
                size = {0x62: 4, 0x6A: 2, 0x72: 1, 0x7A: 8}[op]
                self.store((reg[dst] + off) & M64, size, imm & M64)
                continue
            if cls == 0x03:                      # STX
                size = {0x63: 4, 0x6B: 2, 0x73: 1, 0x7B: 8}[op]
                self.store((reg[dst] + off) & M64, size, reg[src])
                continue
            if cls in (0x05, 0x06):              # JMP / JMP32
                is64 = cls == 0x05
                code = op & 0xF0
                if op == 0x05:                   # ja
                    pc += off
                    continue
                if op == 0x85:                   # call
                    idx = pc - 1
                    tgt = self.prog.call_map.get(idx)
                    if tgt is None:
                        tgt = pc + imm           # pc-relative
                    if isinstance(tgt, str):
                        fn = self.syscalls.get(tgt)
                        if fn is None:
                            raise SbpfError(f"unknown syscall {tgt}")
                        reg[0] = fn(self, reg[1], reg[2], reg[3], reg[4],
                                    reg[5]) & M64
                        continue
                    if depth + 1 >= STACK_FRAMES:
                        raise SbpfError("call depth exceeded")
                    stack.append((pc, reg[6], reg[7], reg[8], reg[9],
                                  reg[10]))
                    depth += 1
                    reg[10] = MM_STACK + FRAME * (2 * depth + 1)
                    pc = tgt
                    continue
                if op == 0x8D:                   # callx
                    addr = reg[imm & 0xF] if (imm & 0xF) < 11 else reg[dst]
                    tgt = (addr - MM_PROGRAM - self.prog.text_off) // 8
                    if depth + 1 >= STACK_FRAMES:
                        raise SbpfError("call depth exceeded")
                    stack.append((pc, reg[6], reg[7], reg[8], reg[9],
                                  reg[10]))
                    depth += 1
                    reg[10] = MM_STACK + FRAME * (2 * depth + 1)
                    pc = tgt
                    continue
                if op == 0x95:                   # exit
                    if not stack:
                        return reg[0]
                    pc, reg[6], reg[7], reg[8], reg[9], reg[10] = \
                        stack.pop()
                    depth -= 1
                    continue
                a = reg[dst] if is64 else reg[dst] & M32
                b = reg[src] if (op & 0x08) else (imm & (M64 if is64
                                                         else M32))
                if not is64:
                    b &= M32
                sa = _s64(a) if is64 else _s32(a)
                sb = _s64(b) if is64 else _s32(b)
                take = {
                    0x10: a == b, 0x20: a > b, 0x30: a >= b,
                    0x40: bool(a & b), 0x50: a != b, 0x60: sa > sb,
                    0x70: sa >= sb, 0xA0: a < b, 0xB0: a <= b,
                    0xC0: sa < sb, 0xD0: sa <= sb,
                }.get(code)
                if take is None:
                    raise SbpfError(f"bad jmp op {hex(op)}")
                if take:
                    pc += off
                continue
            raise SbpfError(f"unknown opcode {hex(op)} at pc {pc - 1}")


# ----------------------------------------------------------- input ABI


def serialize_input(instruction_data: bytes,
                    program_id: bytes = b"\x00" * 32) -> bytes:
    """bpf_loader aligned serializer with zero accounts:
    [u64 n_accounts=0][u64 data_len][data][program_id 32]."""
    return (struct.pack("<Q", 0) + struct.pack("<Q", len(instruction_data))
            + instruction_data + program_id)


# ------------------------------------------------------------ syscalls


def make_syscalls(alt_bn128_fn):
    def sol_log_(vm, r1, r2, *a):
        vm.logs.append(vm.read_bytes(r1, r2).decode(errors="replace"))
        return 0

    def sol_memcpy_(vm, dst, src, n, *a):
        vm.write_bytes(dst, vm.read_bytes(src, n))
        return 0

    def sol_memset_(vm, dst, c, n, *a):
        vm.write_bytes(dst, bytes([c & 0xFF]) * n)
        return 0

    def sol_memcmp_(vm, a, b, n, result, *rest):
        ba, bb = vm.read_bytes(a, n), vm.read_bytes(b, n)
        out = 0
        for x, y in zip(ba, bb):
            if x != y:
                out = 1 if x > y else -1
                break
        vm.store(result, 4, out & M32)
        return 0

    def sol_panic_(vm, file, length, line, col, *a):
        fn = vm.read_bytes(file, length).decode(errors="replace")
        raise SbpfError(f"program panic at {fn}:{line}:{col}")

    def abort(vm, *a):
        raise SbpfError("program abort")

    def sol_alt_bn128_group_op(vm, op, inp, inp_len, result, *a):
        data = vm.read_bytes(inp, inp_len)
        ok, out = alt_bn128_fn(op, data)
        if ok:
            vm.write_bytes(result, out)
            return 0
        return 1

    return {
        "sol_log_": sol_log_,
        "sol_memcpy_": sol_memcpy_,
        "sol_memset_": sol_memset_,
        "sol_memcmp_": sol_memcmp_,
        "sol_panic_": sol_panic_,
        "abort": abort,
        "sol_alt_bn128_group_op": sol_alt_bn128_group_op,
    }
