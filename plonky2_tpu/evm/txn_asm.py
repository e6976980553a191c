"""Kernel assembly for transaction processing: in-kernel RLP parsing of
type-0 signed transactions, intrinsic-gas purchase through CONSUME_GAS,
and the state-trie walk that debits/credits transfer balances inside
Segment::TrieData.

Reference correspondence: process_type_0_txn / process_normalized_txn /
intrinsic_gas live in the reference's kernel asm (sources absent from its
tree; behavior spec'd by cpu/kernel/tests/transaction_parsing/
parse_type_0_txn.rs and tests/core/intrinsic_gas.rs, mirrored by tests
here).  Sender recovery: `recover_sender` below re-encodes the signing
payload in-kernel (legacy / EIP-155), keccaks it through KECCAK_GENERAL
and runs the full secp256k1 `ecrecover` (secp_asm.py); the block kernel
can alternatively splice a PROVER_INPUT(txn::sender) witness for
unit-scale proofs (evm/block.py block_kernel in_kernel_ecrecover flag).

Stack convention: `routine(args..., retaddr)` with args above the return
address; routines exit by rearranging to (ret, outs...) and JUMPing.
"""

# TxnFields slot indices (reference constants/txn_fields.rs)
TXN_FIELDS = {
    "TXN_FIELD_CHAIN_ID_PRESENT": 0,
    "TXN_FIELD_CHAIN_ID": 1,
    "TXN_FIELD_NONCE": 2,
    "TXN_FIELD_MAX_PRIORITY_FEE_PER_GAS": 3,
    "TXN_FIELD_MAX_FEE_PER_GAS": 4,
    "TXN_FIELD_GAS_LIMIT": 5,
    "TXN_FIELD_TO": 6,
    "TXN_FIELD_VALUE": 7,
    "TXN_FIELD_DATA_LEN": 8,
    "TXN_FIELD_Y_PARITY": 9,
    "TXN_FIELD_R": 10,
    "TXN_FIELD_S": 11,
    "TXN_FIELD_ORIGIN": 12,
    # re-encoding the signing payload needs the original byte shape of
    # `to`: emptiness (contract creation) and the exact string length
    # (addresses carry leading zeros, so minimal re-encoding would be wrong)
    "TXN_FIELD_TO_PRESENT": 13,
    "TXN_FIELD_TO_LEN": 14,
}


def txn_field_constants() -> dict:
    c = dict(TXN_FIELDS)
    c["GAS_TX"] = 21_000
    c["GAS_TXCREATE"] = 32_000
    return c


TXN_ASM = """
// ---------------------------------------------------------------------------
// helpers
// ---------------------------------------------------------------------------

%macro rlp_read_byte
    // stack: pos -> byte, pos+1
    DUP1
    PUSH @SEGMENT_RLP_RAW
    PUSH 0
    MLOAD_GENERAL
    %stack (byte, pos) -> (1, pos, byte)
    ADD
    SWAP1
    // stack: byte, pos+1
%endmacro

%macro tload
    // stack: virt -> TrieData[virt]
    PUSH @SEGMENT_TRIE_DATA
    PUSH 0
    MLOAD_GENERAL
%endmacro

%macro tstore
    // stack: value, virt -> (empty); TrieData[virt] = value
    %stack (value, virt) -> (0, @SEGMENT_TRIE_DATA, virt, value)
    MSTORE_GENERAL
%endmacro

%macro mstore_txn_field(ix)
    // stack: value -> (empty)
    %stack (value) -> (0, @SEGMENT_TXN_FIELDS, $ix, value)
    MSTORE_GENERAL
%endmacro

%macro mload_txn_field(ix)
    // stack: (empty) -> value
    PUSH $ix
    PUSH @SEGMENT_TXN_FIELDS
    PUSH 0
    MLOAD_GENERAL
%endmacro

// ---------------------------------------------------------------------------
// RLP readers
// ---------------------------------------------------------------------------

// (pos, ret) -> (value, pos') — single byte or 0x80+len short string
GLOBAL rlp_read_scalar:
    %rlp_read_byte
    // stack: b, pos, ret
    DUP1
    PUSH 0x80
    GT                          // 0x80 > b: single-byte literal
    PUSH rrs_single
    JUMPI
    %stack (b, pos) -> (b, 0x80, pos)
    SUB                         // len, pos, ret
    %stack (len, pos) -> (len, 0, pos)
    // stack: len, acc, pos, ret
rrs_loop:
    DUP1
    ISZERO
    PUSH rrs_done
    JUMPI
    %stack (len, acc, pos) -> (pos, len, acc)
    %rlp_read_byte
    // stack: byte, pos, len, acc
    %stack (byte, pos, len, acc) -> (acc, 256, byte, len, pos)
    MUL
    ADD                         // acc' = acc*256 + byte
    // stack: acc, len, pos
    %stack (acc, len) -> (len, 1, acc)
    SUB
    // stack: len-1, acc, pos
    PUSH rrs_loop
    JUMP
rrs_done:
    // stack: 0, acc, pos, ret
    POP
    %stack (acc, pos, ret) -> (ret, acc, pos)
    JUMP
rrs_single:
    %stack (b, pos, ret) -> (ret, b, pos)
    JUMP

// (pos, ret) -> (value, len, pos') — like rlp_read_scalar but also
// returns the original string byte-length (needed to re-encode `to`
// faithfully: addresses carry leading zeros)
GLOBAL rlp_read_scalar_len:
    %rlp_read_byte
    // b, pos, ret
    DUP1
    PUSH 0x80
    GT
    PUSH rrsl_single
    JUMPI
    %stack (b, pos) -> (b, 0x80, pos)
    SUB
    // len, pos, ret
    DUP1
    %stack (len, len2, pos) -> (len, 0, pos, len2)
    // len, acc, pos, len0, ret
rrsl_loop:
    DUP1
    ISZERO
    PUSH rrsl_done
    JUMPI
    %stack (len, acc, pos) -> (pos, len, acc)
    %rlp_read_byte
    // byte, pos, len, acc, len0, ret
    %stack (byte, pos, len, acc) -> (acc, 256, byte, len, pos)
    MUL
    ADD
    %stack (acc, len) -> (len, 1, acc)
    SUB
    PUSH rrsl_loop
    JUMP
rrsl_done:
    POP
    %stack (acc, pos, len0, ret) -> (ret, acc, len0, pos)
    JUMP
rrsl_single:
    %stack (b, pos, ret) -> (ret, b, 1, pos)
    JUMP

// (pos, ret) -> (datalen, pos') — bytes written to Segment::TxnData[0..len)
GLOBAL rlp_read_data:
    %rlp_read_byte
    // stack: b, pos, ret
    DUP1
    PUSH 0x80
    GT
    PUSH rrd_single
    JUMPI
    %stack (b, pos) -> (b, 0x80, pos)
    SUB                         // len, pos, ret
    %stack (len, pos) -> (0, len, pos)
    // stack: i, len, pos, ret
rrd_loop:
    DUP2
    DUP2
    EQ
    PUSH rrd_done
    JUMPI
    %stack (i, len, pos) -> (pos, i, len)
    %rlp_read_byte
    // stack: byte, pos, i, len
    DUP3
    // stack: i, byte, pos, i, len
    %stack (i, byte) -> (0, @SEGMENT_TXN_DATA, i, byte)
    MSTORE_GENERAL
    // stack: pos, i, len
    %stack (pos, i, len) -> (1, i, len, pos)
    ADD
    %stack (i, len, pos) -> (i, len, pos)
    PUSH rrd_loop
    JUMP
rrd_done:
    // stack: i(==len), len, pos, ret
    POP
    %stack (len, pos, ret) -> (ret, len, pos)
    JUMP
rrd_single:
    // single data byte b < 0x80
    %stack (b, pos) -> (0, @SEGMENT_TXN_DATA, 0, b, 1, pos)
    MSTORE_GENERAL
    %stack (len, pos, ret) -> (ret, len, pos)
    JUMP

// ---------------------------------------------------------------------------
// type-0 transaction parsing (spec: parse_type_0_txn.rs)
// ---------------------------------------------------------------------------

// (ret) -> (); txn RLP expected at RlpRaw[0..]; fields land in TxnFields
GLOBAL process_type_0_txn:
    PUSH 0                      // pos
    %rlp_read_byte              // b, pos, ret
    DUP1
    PUSH 0xf7
    LT                          // 0xf7 < b: long list
    PUSH p0_long
    JUMPI
    POP                         // short list: header is one byte
    PUSH p0_fields
    JUMP
p0_long:
    %stack (b, pos) -> (b, 0xf7, pos)
    SUB                         // lenlen, pos
    ADD                         // pos += lenlen
p0_fields:
    // stack: pos, ret
    %stack (pos) -> (pos, p0_n)
    PUSH rlp_read_scalar
    JUMP
p0_n:
    %mstore_txn_field(@TXN_FIELD_NONCE)
    %stack (pos) -> (pos, p0_gp)
    PUSH rlp_read_scalar
    JUMP
p0_gp:
    DUP1
    %mstore_txn_field(@TXN_FIELD_MAX_PRIORITY_FEE_PER_GAS)
    %mstore_txn_field(@TXN_FIELD_MAX_FEE_PER_GAS)
    %stack (pos) -> (pos, p0_gas)
    PUSH rlp_read_scalar
    JUMP
p0_gas:
    %mstore_txn_field(@TXN_FIELD_GAS_LIMIT)
    %stack (pos) -> (pos, p0_to)
    PUSH rlp_read_scalar_len
    JUMP
p0_to:
    // value, len, pos, ret
    %mstore_txn_field(@TXN_FIELD_TO)
    DUP1
    %mstore_txn_field(@TXN_FIELD_TO_LEN)
    // to_present = (len != 0)
    ISZERO
    %stack (z) -> (1, z)
    SUB
    %mstore_txn_field(@TXN_FIELD_TO_PRESENT)
    %stack (pos) -> (pos, p0_value)
    PUSH rlp_read_scalar
    JUMP
p0_value:
    %mstore_txn_field(@TXN_FIELD_VALUE)
    %stack (pos) -> (pos, p0_data)
    PUSH rlp_read_data
    JUMP
p0_data:
    %mstore_txn_field(@TXN_FIELD_DATA_LEN)
    %stack (pos) -> (pos, p0_v)
    PUSH rlp_read_scalar
    JUMP
p0_v:
    // stack: v, pos, ret
    DUP1
    PUSH 34
    LT                          // 34 < v: EIP-155
    PUSH p0_eip155
    JUMPI
    %stack (v) -> (v, 27)
    SUB
    %mstore_txn_field(@TXN_FIELD_Y_PARITY)
    PUSH 0
    %mstore_txn_field(@TXN_FIELD_CHAIN_ID_PRESENT)
    PUSH 0
    %mstore_txn_field(@TXN_FIELD_CHAIN_ID)
    PUSH p0_rs
    JUMP
p0_eip155:
    // stack: v, pos, ret
    PUSH 1
    %mstore_txn_field(@TXN_FIELD_CHAIN_ID_PRESENT)
    %stack (v) -> (v, 35)
    SUB                         // d = v - 35, pos, ret
    DUP1
    %stack (d) -> (d, 2)
    MOD                         // d % 2, d, pos
    %mstore_txn_field(@TXN_FIELD_Y_PARITY)
    %stack (d) -> (d, 2)
    DIV                         // d / 2, pos
    %mstore_txn_field(@TXN_FIELD_CHAIN_ID)
p0_rs:
    // stack: pos, ret
    %stack (pos) -> (pos, p0_r)
    PUSH rlp_read_scalar
    JUMP
p0_r:
    %mstore_txn_field(@TXN_FIELD_R)
    %stack (pos) -> (pos, p0_s)
    PUSH rlp_read_scalar
    JUMP
p0_s:
    %mstore_txn_field(@TXN_FIELD_S)
    POP                         // pos
    // stack: ret — parsing/normalization complete
GLOBAL process_normalized_txn:
    JUMP

// ---------------------------------------------------------------------------
// intrinsic gas (spec: intrinsic_gas.rs): GAS_TX + data costs; charged
// through the constrained CONSUME_GAS instruction (the reference leaves
// Operation::ConsumeGas as todo!() — here it executes)
// ---------------------------------------------------------------------------

// (ret) -> ()
GLOBAL buy_intrinsic_gas:
    %mload_txn_field(@TXN_FIELD_DATA_LEN)
    %stack (len) -> (0, @GAS_TX, len)
    // stack: i, cost, len, ret
ig_loop:
    DUP3
    DUP2
    EQ
    PUSH ig_done
    JUMPI
    DUP1
    PUSH @SEGMENT_TXN_DATA
    PUSH 0
    MLOAD_GENERAL               // byte, i, cost, len
    ISZERO
    PUSH 12
    MUL                         // 12*is_zero, i, cost, len
    %stack (z12) -> (16, z12)
    SUB                         // 16 - 12*is_zero (16 nonzero / 4 zero)
    %stack (inc, i, cost) -> (inc, cost, i)
    ADD                         // cost', i, len
    SWAP1
    PUSH 1
    ADD                         // i+1, cost', len
    PUSH ig_loop
    JUMP
ig_done:
    // stack: i, cost, len, ret
    POP
    SWAP1
    POP                         // cost, ret
    CONSUME_GAS
    JUMP

// ---------------------------------------------------------------------------
// address -> state-trie key: keccak(addr), big-endian
// ---------------------------------------------------------------------------

// (addr, ret) -> (key)
GLOBAL addr_to_key:
    PUSH 0                      // i, addr, ret
a2k_loop:
    DUP1
    PUSH 20
    EQ
    PUSH a2k_hash
    JUMPI
    // byte = (addr >> 8*(19-i)) & 0xff
    %stack (i, addr) -> (19, i, i, addr)
    SUB                         // 19-i, i, addr
    PUSH 8
    MUL                         // sh, i, addr
    DUP3
    SWAP1                       // sh, addr, i, addr
    SHR                         // addr >> sh, i, addr
    PUSH 0xff
    AND                         // byte, i, addr
    DUP2
    %stack (i, byte) -> (0, @SEGMENT_KERNEL_GENERAL, i, byte)
    MSTORE_GENERAL              // i, addr
    PUSH 1
    ADD
    PUSH a2k_loop
    JUMP
a2k_hash:
    // stack: 20, addr, ret
    POP
    POP
    PUSH 20
    PUSH 0
    PUSH @SEGMENT_KERNEL_GENERAL
    PUSH 0
    KECCAK_GENERAL              // digest (little-endian u32-limb int), ret
    // byte-reverse the 32-byte digest -> big-endian trie key
    %stack (d) -> (0, 0, d)     // j, acc, d
a2k_rev:
    DUP1
    PUSH 32
    EQ
    PUSH a2k_done
    JUMPI
    %stack (j, acc, d) -> (d, 0xff, acc, j, d)
    AND                         // low, acc, j, d
    %stack (low, acc) -> (acc, 256, low)
    MUL
    ADD                         // acc' = acc*256 + low, j, d
    %stack (acc, j, d) -> (8, d, acc, j)
    SHR                         // d >> 8, acc, j
    %stack (d, acc, j) -> (1, j, acc, d)
    ADD                         // j+1, acc, d
    PUSH a2k_rev
    JUMP
a2k_done:
    // stack: 32, key, d, ret
    POP
    SWAP1
    POP                         // key, ret
    SWAP1
    JUMP

// ---------------------------------------------------------------------------
// state-trie walk over the linearized TrieData stream (layout
// mpt.py all_mpt_prover_inputs / reference mpt.rs:37-173)
// ---------------------------------------------------------------------------

// (ptr, ret) -> (next): skip one STORAGE-trie node
GLOBAL mpt_skip_storage:
    DUP1
    %tload                      // kind, ptr, ret
    DUP1
    ISZERO
    PUSH sksto_p1
    JUMPI
    DUP1
    PUSH 1
    EQ
    PUSH sksto_p2
    JUMPI
    DUP1
    PUSH 2
    EQ
    PUSH sksto_branch
    JUMPI
    PUSH 3
    EQ
    PUSH sksto_ext
    JUMPI
    // leaf: [kind, count, packed, value]
    %stack (ptr, ret) -> (4, ptr, ret)
    ADD
    SWAP1
    JUMP
sksto_p1:
    POP
    %stack (ptr, ret) -> (1, ptr, ret)
    ADD
    SWAP1
    JUMP
sksto_p2:
    POP
    %stack (ptr, ret) -> (2, ptr, ret)
    ADD
    SWAP1
    JUMP
sksto_branch:
    POP                         // ptr, ret
    // p = ptr + 2 + value_flag; [kind, flag, (value if flag), children]
    DUP1
    PUSH 1
    ADD
    %tload                      // flag, ptr, ret
    %stack (flag, ptr) -> (flag, 2, ptr)
    ADD
    ADD                         // p, ret
    PUSH 0                      // j, p, ret
sksto_bloop:
    DUP1
    PUSH 16
    EQ
    PUSH sksto_bdone
    JUMPI
    %stack (j, p) -> (p, sksto_bret, j)
    PUSH mpt_skip_storage
    JUMP
sksto_bret:
    // p', j, ret
    SWAP1
    PUSH 1
    ADD                         // j+1, p', ret
    PUSH sksto_bloop
    JUMP
sksto_bdone:
    POP
    SWAP1
    JUMP
sksto_ext:
    // stack: ptr, ret   ([kind, count, packed, child...])
    %stack (ptr, ret) -> (3, ptr, ret)
    ADD                         // child_ptr, ret — tail call
    PUSH mpt_skip_storage
    JUMP

// (ptr, ret) -> (next): skip one STATE-trie node
GLOBAL mpt_skip_state:
    DUP1
    %tload                      // kind, ptr, ret
    DUP1
    ISZERO
    PUSH sks_p1
    JUMPI
    DUP1
    PUSH 1
    EQ
    PUSH sks_p2
    JUMPI
    DUP1
    PUSH 2
    EQ
    PUSH sks_branch
    JUMPI
    PUSH 3
    EQ
    PUSH sks_ext
    JUMPI
    // account leaf: [kind, count, packed, nonce, balance,
    //               <storage subtree>, code_hash]
    %stack (ptr, ret) -> (5, ptr, sks_leaf_ret, ret)
    ADD
    PUSH mpt_skip_storage
    JUMP
sks_leaf_ret:
    // storage_next, ret
    PUSH 1
    ADD                         // +1 skips code_hash
    SWAP1
    JUMP
sks_p1:
    POP
    %stack (ptr, ret) -> (1, ptr, ret)
    ADD
    SWAP1
    JUMP
sks_p2:
    POP
    %stack (ptr, ret) -> (2, ptr, ret)
    ADD
    SWAP1
    JUMP
sks_branch:
    POP
    // state branches carry no value: [kind, 0, children]
    %stack (ptr, ret) -> (2, ptr, ret)
    ADD                         // p, ret
    PUSH 0                      // j, p, ret
sks_bloop:
    DUP1
    PUSH 16
    EQ
    PUSH sks_bdone
    JUMPI
    %stack (j, p) -> (p, sks_bret, j)
    PUSH mpt_skip_state
    JUMP
sks_bret:
    SWAP1
    PUSH 1
    ADD
    PUSH sks_bloop
    JUMP
sks_bdone:
    POP
    SWAP1
    JUMP
sks_ext:
    %stack (ptr, ret) -> (3, ptr, ret)
    ADD
    PUSH mpt_skip_state
    JUMP

// (ptr, cnt, key, ret) -> (payload_ptr or 0): find the account leaf whose
// full 64-nibble key is `key`; payload_ptr points at the nonce slot
GLOBAL mpt_find_state:
    DUP1
    %tload                      // kind, ptr, cnt, key, ret
    DUP1
    ISZERO
    PUSH mfs_absent_k
    JUMPI
    DUP1
    PUSH 1
    EQ
    PUSH mfs_absent_k
    JUMPI
    DUP1
    PUSH 2
    EQ
    PUSH mfs_branch
    JUMPI
    PUSH 3
    EQ
    PUSH mfs_ext
    JUMPI
    // leaf: key matches iff count == cnt and packed == key
    DUP1
    PUSH 1
    ADD
    %tload                      // count, ptr, cnt, key, ret
    DUP3
    EQ
    ISZERO
    PUSH mfs_absent
    JUMPI
    DUP1
    PUSH 2
    ADD
    %tload                      // packed, ptr, cnt, key, ret
    DUP4
    EQ
    ISZERO
    PUSH mfs_absent
    JUMPI
    %stack (ptr, cnt, key, ret) -> (3, ptr, ret)
    ADD
    SWAP1
    JUMP
mfs_absent_k:
    POP
mfs_absent:
    %stack (ptr, cnt, key, ret) -> (ret, 0)
    JUMP
mfs_branch:
    POP                         // ptr, cnt, key, ret
    // sh = 4*(cnt-1); nib = key >> sh; rem = key - (nib << sh)
    %stack (ptr, cnt, key) -> (cnt, 1, ptr, cnt, key)
    SUB
    PUSH 4
    MUL                         // sh, ptr, cnt, key
    DUP4
    DUP2                        // sh, key, sh, ptr, cnt, key
    SHR                         // nib, sh, ptr, cnt, key
    DUP2
    DUP2
    SWAP1                       // sh, nib, nib, sh, ptr, cnt, key
    SHL                         // nib<<sh, nib, sh, ptr, cnt, key
    %stack (nsh, nib, sh, ptr, cnt, key) -> (key, nsh, nib, ptr, cnt)
    SUB                         // rem, nib, ptr, cnt
    %stack (rem, nib, ptr, cnt) -> (2, ptr, nib, cnt, rem)
    ADD                         // p, nib, cnt, rem
    PUSH 0                      // j, p, nib, cnt, rem, ret
mfs_bloop:
    DUP3
    DUP2
    EQ
    PUSH mfs_bdesc
    JUMPI
    %stack (j, p) -> (p, mfs_bskipret, j)
    PUSH mpt_skip_state
    JUMP
mfs_bskipret:
    // p', j, nib, cnt, rem, ret
    SWAP1
    PUSH 1
    ADD                         // j+1, p', nib, cnt, rem, ret
    PUSH mfs_bloop
    JUMP
mfs_bdesc:
    // j, p, nib, cnt, rem, ret
    %stack (j, p, nib, cnt, rem) -> (cnt, 1, p, rem)
    SUB                         // cnt-1, p, rem, ret
    %stack (cnt1, p, rem) -> (p, cnt1, rem)
    PUSH mpt_find_state
    JUMP
mfs_ext:
    // stack: ptr, cnt, key, ret   ([kind, count, packed, child])
    DUP1
    PUSH 1
    ADD
    %tload                      // pcnt, ptr, cnt, key, ret
    DUP3
    DUP2
    SWAP1                       // cnt, pcnt, pcnt, ptr, cnt, key
    SUB                         // cnt-pcnt, pcnt, ptr, cnt, key
    PUSH 4
    MUL                         // dsh, pcnt, ptr, cnt, key
    DUP5
    DUP2                        // dsh, key, dsh, pcnt, ptr, cnt, key
    SHR                         // keytop, dsh, pcnt, ptr, cnt, key
    DUP4
    PUSH 2
    ADD
    %tload                      // ppk, keytop, dsh, pcnt, ptr, cnt, key
    DUP2
    EQ
    ISZERO
    PUSH mfs_ext_absent
    JUMPI
    // rem = key - (keytop << dsh)
    DUP2
    DUP2
    SWAP1                       // dsh, keytop, keytop, dsh, pcnt, ptr, cnt, key
    SHL                         // keytop<<dsh, keytop, dsh, pcnt, ptr, cnt, key
    %stack (tsh, keytop, dsh, pcnt, ptr, cnt, key) -> (key, tsh, pcnt, ptr, cnt)
    SUB                         // rem, pcnt, ptr, cnt
    %stack (rem, pcnt, ptr, cnt) -> (cnt, pcnt, 3, ptr, rem)
    SUB                         // cnt', 3, ptr, rem
    %stack (cnt1, three, ptr, rem) -> (three, ptr, cnt1, rem)
    ADD                         // p', cnt', rem, ret
    PUSH mpt_find_state
    JUMP
mfs_ext_absent:
    %stack (keytop, dsh, pcnt, ptr, cnt, key, ret) -> (ret, 0)
    JUMP

// ---------------------------------------------------------------------------
// the transfer itself
// ---------------------------------------------------------------------------

// (ret) -> (): debit Origin by Value, credit To (if its account is loaded).
// TXN_FIELD_ORIGIN must already hold the sender — either recovered
// in-kernel (recover_sender below) or prover-supplied, per the block
// kernel's sender splice (evm/block.py block_kernel).
GLOBAL txn_transfer:
    %mload_txn_field(@TXN_FIELD_ORIGIN)
    %stack (origin) -> (origin, tt_skey)
    PUSH addr_to_key
    JUMP
tt_skey:
    // key, ret
    %stack (key) -> (0, 64, key, tt_sfound)
    PUSH mpt_find_state
    JUMP
tt_sfound:
    // payload, ret
    DUP1
    ISZERO
    PUSH tt_panic
    JUMPI
    PUSH 1
    ADD                         // bal_ptr (payload points at nonce)
    DUP1
    %tload                      // bal, bal_ptr
    %mload_txn_field(@TXN_FIELD_VALUE)
    // value, bal, bal_ptr
    DUP2
    DUP2
    SWAP1                       // bal, value, value, bal, bal_ptr
    LT                          // bal < value ?, value, bal, bal_ptr
    PUSH tt_panic
    JUMPI
    %stack (value, bal) -> (bal, value)
    SUB                         // bal - value, bal_ptr
    %tstore
    // credit `to` if its account is in the loaded state trie
    %mload_txn_field(@TXN_FIELD_TO)
    %stack (to) -> (to, tt_tkey)
    PUSH addr_to_key
    JUMP
tt_tkey:
    %stack (key) -> (0, 64, key, tt_tfound)
    PUSH mpt_find_state
    JUMP
tt_tfound:
    DUP1
    ISZERO
    PUSH tt_tabsent
    JUMPI
    PUSH 1
    ADD
    DUP1
    %tload
    %mload_txn_field(@TXN_FIELD_VALUE)
    ADD                         // bal + value, bal_ptr
    %tstore
    PUSH tt_end
    JUMP
tt_tabsent:
    POP
tt_end:
    JUMP
tt_panic:
    PANIC

// ---------------------------------------------------------------------------
// signing hash (legacy / EIP-155) + in-kernel sender recovery.  The RLP
// signing payload re-encodes from the parsed TxnFields + TxnData bytes
// into Segment::KernelGeneral (payload at offset 25, header reserve
// before it), is keccaked via KECCAK_GENERAL, and feeds ecrecover
// (secp_asm.py).  Canonical-scalar re-encoding reproduces the original
// bytes for consensus-valid transactions.
// ---------------------------------------------------------------------------

%macro sighash_scalar(fld)
    // (pos) -> (pos')
    %mload_txn_field($fld)
    %stack (v, pos) -> (@SEGMENT_KERNEL_GENERAL, pos, v, %%after)
    PUSH rlp_write_scalar
    JUMP
%%after:
%endmacro

// (ret) -> (z): big-endian keccak of the signing payload
GLOBAL compute_type0_sighash:
    PUSH 25
    %sighash_scalar(@TXN_FIELD_NONCE)
    %sighash_scalar(@TXN_FIELD_MAX_FEE_PER_GAS)
    %sighash_scalar(@TXN_FIELD_GAS_LIMIT)
    // `to`: absent -> 0x80; else the original-length byte string
    %mload_txn_field(@TXN_FIELD_TO_PRESENT)
    ISZERO
    PUSH sh_to_absent
    JUMPI
    %mload_txn_field(@TXN_FIELD_TO_LEN)
    // len, pos
    DUP1
    PUSH 1
    EQ
    PUSH sh_to_maybe_single
    JUMPI
sh_to_multi:
    DUP1
    %stack (len) -> (len, 0x80)
    ADD
    DUP3
    %stack (pos, hdr) -> (0, @SEGMENT_KERNEL_GENERAL, pos, hdr)
    MSTORE_GENERAL
    // len, pos
    %mload_txn_field(@TXN_FIELD_TO)
    // to, len, pos
    %stack (to, len, pos) -> (pos, 1, to, len, len, pos)
    ADD
    %stack (pos1, to, len) -> (@SEGMENT_KERNEL_GENERAL, to, pos1, len, sh_to_stored)
    PUSH store_be
    JUMP
sh_to_stored:
    // len, pos
    ADD
    %stack (x) -> (x, 1)
    ADD
    PUSH sh_value
    JUMP
sh_to_maybe_single:
    // len(=1), pos
    %mload_txn_field(@TXN_FIELD_TO)
    DUP1
    PUSH 0x80
    GT
    PUSH sh_to_single
    JUMPI
    POP
    PUSH sh_to_multi
    JUMP
sh_to_single:
    %stack (to, len, pos) -> (0, @SEGMENT_KERNEL_GENERAL, pos, to, pos)
    MSTORE_GENERAL
    %stack (pos) -> (pos, 1)
    ADD
    PUSH sh_value
    JUMP
sh_to_absent:
    DUP1
    %stack (pos) -> (0, @SEGMENT_KERNEL_GENERAL, pos, 0x80)
    MSTORE_GENERAL
    %stack (pos) -> (pos, 1)
    ADD
sh_value:
    %sighash_scalar(@TXN_FIELD_VALUE)
    // data: the raw bytes in Segment::TxnData[0..DATA_LEN)
    %mload_txn_field(@TXN_FIELD_DATA_LEN)
    // dlen, pos
    DUP1
    PUSH 1
    EQ
    PUSH sh_data_maybe_single
    JUMPI
sh_data_multi:
    // dlen is 0 or >= 2 here: prefix_fwd's short/long forms apply
    %stack (dlen, pos) -> (@SEGMENT_KERNEL_GENERAL, pos, dlen, sh_data_hdr, dlen)
    PUSH rlp_write_str_prefix_fwd
    JUMP
sh_data_hdr:
    // pos', dlen
    SWAP1
sh_data_copy:
    // dlen, pos
    %stack (dlen, pos) -> (@SEGMENT_KERNEL_GENERAL, pos, @SEGMENT_TXN_DATA, 0, dlen, sh_data_done, pos, dlen)
    PUSH mem_copy
    JUMP
sh_data_done:
    // pos, dlen
    ADD
    PUSH sh_chainid
    JUMP
sh_data_maybe_single:
    // a raw 1-byte string is verbatim only below 0x80 (unlike the RLP-item
    // payloads rlp_write_str_prefix_fwd wraps), so handle both cases here
    PUSH 0
    PUSH @SEGMENT_TXN_DATA
    PUSH 0
    MLOAD_GENERAL
    // b, dlen, pos
    DUP1
    PUSH 0x80
    GT
    PUSH sh_data_single
    JUMPI
    POP
    // dlen(=1), pos: header 0x81, then copy the byte
    DUP2
    %stack (pos) -> (0, @SEGMENT_KERNEL_GENERAL, pos, 0x81)
    MSTORE_GENERAL
    SWAP1
    %stack (pos) -> (pos, 1)
    ADD
    SWAP1
    PUSH sh_data_copy
    JUMP
sh_data_single:
    %stack (b, dlen, pos) -> (0, @SEGMENT_KERNEL_GENERAL, pos, b, pos)
    MSTORE_GENERAL
    %stack (pos) -> (pos, 1)
    ADD
sh_chainid:
    // pos
    %mload_txn_field(@TXN_FIELD_CHAIN_ID_PRESENT)
    ISZERO
    PUSH sh_finish
    JUMPI
    %sighash_scalar(@TXN_FIELD_CHAIN_ID)
    // EIP-155: two empty scalars close the payload
    DUP1
    %stack (pos) -> (0, @SEGMENT_KERNEL_GENERAL, pos, 0x80)
    MSTORE_GENERAL
    %stack (pos) -> (pos, 1)
    ADD
    DUP1
    %stack (pos) -> (0, @SEGMENT_KERNEL_GENERAL, pos, 0x80)
    MSTORE_GENERAL
    %stack (pos) -> (pos, 1)
    ADD
sh_finish:
    // pe, ret
    DUP1
    %stack (pe) -> (pe, 25)
    SUB
    // L, pe, ret
    %stack (l) -> (@SEGMENT_KERNEL_GENERAL, 25, l, sh_prefixed)
    PUSH rlp_write_list_prefix
    JUMP
sh_prefixed:
    // hstart, pe, ret
    DUP2
    DUP2
    SWAP1
    SUB
    // total = pe - hstart, hstart, pe, ret
    %stack (total, hstart, pe) -> (0, @SEGMENT_KERNEL_GENERAL, hstart, total)
    KECCAK_GENERAL
    %stack (z) -> (z, sh_swapped)
    PUSH u256_byteswap
    JUMP
sh_swapped:
    %stack (z, ret) -> (ret, z)
    JUMP

// (ret) -> (): recover the sender entirely in-kernel from the parsed
// signature and store it as TXN_FIELD_ORIGIN; an invalid signature can
// never reach the halt label (PANIC), so no proof exists for it
GLOBAL recover_sender:
    PUSH rs_hashed
    PUSH compute_type0_sighash
    JUMP
rs_hashed:
    // z, ret
    %mload_txn_field(@TXN_FIELD_Y_PARITY)
    %stack (p) -> (p, 27)
    ADD
    // v, z, ret
    %mload_txn_field(@TXN_FIELD_R)
    %mload_txn_field(@TXN_FIELD_S)
    // s, r, v, z, ret
    %stack (s, r, v, z) -> (z, v, r, s, rs_done)
    PUSH ecrecover
    JUMP
rs_done:
    // addr, ret
    DUP1
    PUSH @U256_MAX
    EQ
    PUSH rs_invalid
    JUMPI
    %mstore_txn_field(@TXN_FIELD_ORIGIN)
    JUMP
rs_invalid:
    PANIC
"""
