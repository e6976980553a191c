"""Kernel assembly for transaction processing: in-kernel RLP parsing of
type-0 signed transactions, intrinsic-gas purchase through CONSUME_GAS,
and the state-trie walk that debits/credits transfer balances inside
Segment::TrieData.

Reference correspondence: process_type_0_txn / process_normalized_txn /
intrinsic_gas live in the reference's kernel asm (sources absent from its
tree; behavior spec'd by cpu/kernel/tests/transaction_parsing/
parse_type_0_txn.rs and tests/core/intrinsic_gas.rs, mirrored by tests
here).  Sender recovery (the reference's ecrecover.asm) enters through
PROVER_INPUT(txn::sender) — host-computed secp256k1 recovery
(ecdsa/curve.py ecrecover) — documented as prover-supplied until the
in-kernel curve routine library lands.

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
    PUSH rlp_read_scalar
    JUMP
p0_to:
    %mstore_txn_field(@TXN_FIELD_TO)
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

// (ret) -> (): debit Origin by Value, credit To (if its account is loaded)
GLOBAL txn_transfer:
    PROVER_INPUT(txn::sender)
    DUP1
    %mstore_txn_field(@TXN_FIELD_ORIGIN)
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
"""
