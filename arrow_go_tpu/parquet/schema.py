"""Arrow <-> Parquet schema conversion (reference parquet/schema +
parquet/pqarrow/schema.go). Round-1 scope: flat columns of all primitive
arrow families incl. decimal/temporal/dictionary; nested list/struct
columns via the standard group encodings."""
from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import List, Optional, Tuple

import numpy as np

from .. import dtypes as dt
from ..compute.errors import ArrowNotImplemented
from . import format as fmt


@dataclass
class ColumnDescriptor:
    """Leaf column: physical type + levels info
    (reference parquet/schema/column.go)."""

    path: Tuple[str, ...]
    physical_type: fmt.Type
    type_length: int
    max_def_level: int
    max_rep_level: int
    arrow_type: dt.DataType
    schema_elements: List[fmt.SchemaElement]  # root-to-leaf elements


def _logical_for(t: dt.DataType) -> Tuple[Optional[fmt.LogicalType],
                                          Optional[int]]:
    """(LogicalType, converted_type) annotations."""
    tid = t.id
    if tid in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING):
        return fmt.LogicalType(STRING=fmt.StringType()), int(fmt.ConvertedType.UTF8)
    if tid == dt.TypeId.DATE32:
        return fmt.LogicalType(DATE=fmt.DateLType()), int(fmt.ConvertedType.DATE)
    if tid == dt.TypeId.TIMESTAMP:
        unit = {dt.TimeUnit.MILLISECOND: fmt.TimeUnitU(MILLIS=fmt.MilliSeconds()),
                dt.TimeUnit.MICROSECOND: fmt.TimeUnitU(MICROS=fmt.MicroSeconds()),
                dt.TimeUnit.NANOSECOND: fmt.TimeUnitU(NANOS=fmt.NanoSeconds())}
        u = unit.get(t.unit)
        if u is None:
            return None, None
        conv = {dt.TimeUnit.MILLISECOND: int(fmt.ConvertedType.TIMESTAMP_MILLIS),
                dt.TimeUnit.MICROSECOND: int(fmt.ConvertedType.TIMESTAMP_MICROS)
                }.get(t.unit)
        return fmt.LogicalType(TIMESTAMP=fmt.TimestampLType(
            isAdjustedToUTC=bool(t.tz), unit=u)), conv
    if tid == dt.TypeId.TIME32:
        return fmt.LogicalType(TIME=fmt.TimeLType(
            isAdjustedToUTC=False,
            unit=fmt.TimeUnitU(MILLIS=fmt.MilliSeconds()))), \
            int(fmt.ConvertedType.TIME_MILLIS)
    if tid == dt.TypeId.TIME64:
        u = fmt.TimeUnitU(MICROS=fmt.MicroSeconds()) \
            if t.unit == dt.TimeUnit.MICROSECOND else \
            fmt.TimeUnitU(NANOS=fmt.NanoSeconds())
        conv = int(fmt.ConvertedType.TIME_MICROS) \
            if t.unit == dt.TimeUnit.MICROSECOND else None
        return fmt.LogicalType(TIME=fmt.TimeLType(isAdjustedToUTC=False,
                                                  unit=u)), conv
    if t.is_decimal:
        return fmt.LogicalType(DECIMAL=fmt.DecimalLType(
            scale=t.scale, precision=t.precision)), int(fmt.ConvertedType.DECIMAL)
    if tid == dt.TypeId.UINT8:
        return fmt.LogicalType(INTEGER=fmt.IntLType(bitWidth=8, isSigned=False)), \
            int(fmt.ConvertedType.UINT_8)
    if tid == dt.TypeId.UINT16:
        return fmt.LogicalType(INTEGER=fmt.IntLType(bitWidth=16, isSigned=False)), \
            int(fmt.ConvertedType.UINT_16)
    if tid == dt.TypeId.UINT32:
        return fmt.LogicalType(INTEGER=fmt.IntLType(bitWidth=32, isSigned=False)), \
            int(fmt.ConvertedType.UINT_32)
    if tid == dt.TypeId.UINT64:
        return fmt.LogicalType(INTEGER=fmt.IntLType(bitWidth=64, isSigned=False)), \
            int(fmt.ConvertedType.UINT_64)
    if tid == dt.TypeId.INT8:
        return fmt.LogicalType(INTEGER=fmt.IntLType(bitWidth=8, isSigned=True)), \
            int(fmt.ConvertedType.INT_8)
    if tid == dt.TypeId.INT16:
        return fmt.LogicalType(INTEGER=fmt.IntLType(bitWidth=16, isSigned=True)), \
            int(fmt.ConvertedType.INT_16)
    if tid == dt.TypeId.FLOAT16:
        return fmt.LogicalType(FLOAT16=fmt.Float16LType()), None
    return None, None


def physical_for(t: dt.DataType,
                 store_decimal_as_integer: bool = False
                 ) -> Tuple[fmt.Type, int]:
    """(physical type, type_length). store_decimal_as_integer maps
    small-precision decimals onto INT32/INT64 instead of FLBA (reference
    WithStoreDecimalAsInteger, parquet/writer_properties.go:365)."""
    tid = t.id
    if store_decimal_as_integer and t.is_decimal:
        if t.precision <= 9:
            return fmt.Type.INT32, 0
        if t.precision <= 18:
            return fmt.Type.INT64, 0
    if tid == dt.TypeId.BOOL:
        return fmt.Type.BOOLEAN, 0
    if tid in (dt.TypeId.INT8, dt.TypeId.INT16, dt.TypeId.INT32,
               dt.TypeId.UINT8, dt.TypeId.UINT16, dt.TypeId.DATE32,
               dt.TypeId.TIME32):
        return fmt.Type.INT32, 0
    if tid == dt.TypeId.UINT32:
        return fmt.Type.INT32, 0
    if tid in (dt.TypeId.INT64, dt.TypeId.UINT64, dt.TypeId.TIMESTAMP,
               dt.TypeId.TIME64, dt.TypeId.DATE64, dt.TypeId.DURATION):
        return fmt.Type.INT64, 0
    if tid == dt.TypeId.FLOAT16:
        return fmt.Type.FIXED_LEN_BYTE_ARRAY, 2
    if tid == dt.TypeId.FLOAT32:
        return fmt.Type.FLOAT, 0
    if tid == dt.TypeId.FLOAT64:
        return fmt.Type.DOUBLE, 0
    if tid in (dt.TypeId.STRING, dt.TypeId.LARGE_STRING, dt.TypeId.BINARY,
               dt.TypeId.LARGE_BINARY):
        return fmt.Type.BYTE_ARRAY, 0
    if tid == dt.TypeId.FIXED_SIZE_BINARY:
        return fmt.Type.FIXED_LEN_BYTE_ARRAY, t.byte_width
    if tid == dt.TypeId.DECIMAL32:
        return fmt.Type.INT32, 0
    if tid == dt.TypeId.DECIMAL64:
        return fmt.Type.INT64, 0
    if tid in (dt.TypeId.DECIMAL128, dt.TypeId.DECIMAL256):
        return fmt.Type.FIXED_LEN_BYTE_ARRAY, t.bit_width // 8
    if tid == dt.TypeId.DICTIONARY:
        return physical_for(t.value_type)
    raise ArrowNotImplemented(f"no parquet physical type for {t}")


def schema_to_elements(schema: dt.Schema,
                       store_decimal_as_integer: bool = False
                       ) -> Tuple[List[fmt.SchemaElement],
                                  List[ColumnDescriptor]]:
    """Arrow schema -> flat SchemaElement list (depth-first) + leaf columns."""
    elements = [fmt.SchemaElement(name="schema",
                                  num_children=len(schema.fields))]
    leaves: List[ColumnDescriptor] = []

    def walk(f: dt.Field, path, max_def, max_rep, ancestry):
        t = f.type
        rep = fmt.Repetition.OPTIONAL if f.nullable else fmt.Repetition.REQUIRED
        d = max_def + (1 if f.nullable else 0)
        group_logical = None
        if t.id == dt.TypeId.EXTENSION:
            # extensions store as their storage type; parquet.variant gets
            # the VARIANT group annotation (reference pqarrow/schema.go
            # variant handling, schema/logical_types.go:1120)
            if t.extension_name == "parquet.variant":
                group_logical = fmt.LogicalType(
                    VARIANT=fmt.VariantLType(specification_version=1))
            t = t.storage_type
        if t.id == dt.TypeId.STRUCT:
            el = fmt.SchemaElement(name=f.name, repetition_type=int(rep),
                                   num_children=t.num_fields,
                                   logicalType=group_logical)
            elements.append(el)
            for cf in t.fields():
                walk(cf, path + (f.name,), d, max_rep, ancestry + [el])
            return
        if t.id == dt.TypeId.MAP:
            el = fmt.SchemaElement(name=f.name, repetition_type=int(rep),
                                   num_children=1,
                                   converted_type=int(fmt.ConvertedType.MAP),
                                   logicalType=fmt.LogicalType(MAP=fmt.MapLType()))
            mid = fmt.SchemaElement(name="key_value",
                                    repetition_type=int(fmt.Repetition.REPEATED),
                                    num_children=2)
            elements.append(el)
            elements.append(mid)
            walk(dt.Field("key", t.key_type, False),
                 path + (f.name, "key_value"), d + 1, max_rep + 1,
                 ancestry + [el, mid])
            walk(dt.Field("value", t.item_type, t.item_field.nullable),
                 path + (f.name, "key_value"), d + 1, max_rep + 1,
                 ancestry + [el, mid])
            return
        if t.id == dt.TypeId.FIXED_SIZE_LIST:
            # FSL stores as a plain LIST group
            t = dt.ListType(dt.Field(t.value_field.name, t.value_field.type,
                                     t.value_field.nullable))
        if t.id in (dt.TypeId.LIST, dt.TypeId.LARGE_LIST):
            el = fmt.SchemaElement(name=f.name, repetition_type=int(rep),
                                   num_children=1,
                                   converted_type=int(fmt.ConvertedType.LIST),
                                   logicalType=fmt.LogicalType(LIST=fmt.ListLType()))
            mid = fmt.SchemaElement(name="list",
                                    repetition_type=int(fmt.Repetition.REPEATED),
                                    num_children=1)
            elements.append(el)
            elements.append(mid)
            walk(dt.Field("element", t.value_type, t.value_field.nullable),
                 path + (f.name, "list"), d + 1, max_rep + 1,
                 ancestry + [el, mid])
            return
        storage = t.value_type if t.id == dt.TypeId.DICTIONARY else t
        phys, tlen = physical_for(t, store_decimal_as_integer)
        logical, conv = _logical_for(storage)
        el = fmt.SchemaElement(
            name=f.name, type=int(phys),
            type_length=tlen or None,
            repetition_type=int(rep),
            converted_type=conv, logicalType=logical)
        if storage.is_decimal:
            el.scale = storage.scale
            el.precision = storage.precision
        elements.append(el)
        leaves.append(ColumnDescriptor(
            path + (f.name,), phys, tlen, d, max_rep, t,
            ancestry + [el]))

    for f in schema.fields:
        walk(f, (), 0, 0, [])
    return elements, leaves


def elements_to_schema(elements: List[fmt.SchemaElement]
                       ) -> Tuple[dt.Schema, List[ColumnDescriptor]]:
    """Parquet SchemaElement list -> arrow schema + leaf descriptors."""
    pos = [1]
    leaves: List[ColumnDescriptor] = []

    def arrow_type_of(el: fmt.SchemaElement) -> dt.DataType:
        phys = fmt.Type(el.type)
        lt = el.logicalType
        conv = el.converted_type
        if lt is not None:
            if lt.STRING is not None:
                return dt.string
            if lt.DATE is not None:
                return dt.date32
            if lt.DECIMAL is not None:
                p, s = lt.DECIMAL.precision, lt.DECIMAL.scale
                return _decimal_for(phys, el, p, s)
            if lt.TIMESTAMP is not None:
                tz = "UTC" if lt.TIMESTAMP.isAdjustedToUTC else None
                return dt.TimestampType(
                    {"ms": dt.TimeUnit.MILLISECOND, "us": dt.TimeUnit.MICROSECOND,
                     "ns": dt.TimeUnit.NANOSECOND}[lt.TIMESTAMP.unit.unit_str], tz)
            if lt.TIME is not None:
                us = lt.TIME.unit.unit_str
                if us == "ms":
                    return dt.time32("ms")
                return dt.time64(us)
            if lt.INTEGER is not None:
                key = (lt.INTEGER.bitWidth, bool(lt.INTEGER.isSigned))
                return {(8, True): dt.int8, (16, True): dt.int16,
                        (32, True): dt.int32, (64, True): dt.int64,
                        (8, False): dt.uint8, (16, False): dt.uint16,
                        (32, False): dt.uint32, (64, False): dt.uint64}[key]
            if lt.FLOAT16 is not None:
                return dt.float16
        if conv is not None:
            c = fmt.ConvertedType(conv)
            m = {fmt.ConvertedType.UTF8: dt.string,
                 fmt.ConvertedType.DATE: dt.date32,
                 fmt.ConvertedType.TIME_MILLIS: dt.time32("ms"),
                 fmt.ConvertedType.TIME_MICROS: dt.time64("us"),
                 fmt.ConvertedType.TIMESTAMP_MILLIS: dt.timestamp("ms"),
                 fmt.ConvertedType.TIMESTAMP_MICROS: dt.timestamp("us"),
                 fmt.ConvertedType.UINT_8: dt.uint8,
                 fmt.ConvertedType.UINT_16: dt.uint16,
                 fmt.ConvertedType.UINT_32: dt.uint32,
                 fmt.ConvertedType.UINT_64: dt.uint64,
                 fmt.ConvertedType.INT_8: dt.int8,
                 fmt.ConvertedType.INT_16: dt.int16}
            if c in m:
                return m[c]
            if c == fmt.ConvertedType.DECIMAL:
                return _decimal_for(phys, el, el.precision, el.scale)
        return {fmt.Type.BOOLEAN: dt.bool_, fmt.Type.INT32: dt.int32,
                fmt.Type.INT64: dt.int64, fmt.Type.FLOAT: dt.float32,
                fmt.Type.DOUBLE: dt.float64, fmt.Type.BYTE_ARRAY: dt.binary,
                fmt.Type.INT96: dt.timestamp("ns"),
                fmt.Type.FIXED_LEN_BYTE_ARRAY:
                    dt.fixed_size_binary(el.type_length or 0)}[phys]

    def _decimal_for(phys, el, p, s):
        if phys == fmt.Type.INT32:
            return dt.decimal32(p, s) if p <= 9 else dt.decimal128(p, s)
        if phys == fmt.Type.INT64:
            return dt.decimal64(p, s) if p <= 18 else dt.decimal128(p, s)
        return dt.decimal128(p, s) if p <= 38 else dt.decimal256(p, s)

    def read_node(path, max_def, max_rep, ancestry) -> dt.Field:
        el = elements[pos[0]]
        pos[0] += 1
        rep = fmt.Repetition(el.repetition_type or 0)
        nullable = rep == fmt.Repetition.OPTIONAL
        d = max_def + (1 if nullable else 0)
        r = max_rep
        if el.num_children:
            conv = el.converted_type
            is_map = (conv == int(fmt.ConvertedType.MAP) or
                      conv == int(fmt.ConvertedType.MAP_KEY_VALUE) or
                      (el.logicalType is not None and
                       el.logicalType.MAP is not None))
            if is_map:
                mid = elements[pos[0]]
                pos[0] += 1
                kf = read_node(path + (el.name, mid.name), d + 1, r + 1,
                               ancestry + [el, mid])
                vf = read_node(path + (el.name, mid.name), d + 1, r + 1,
                               ancestry + [el, mid])
                t = dt.map_(kf.type, vf.type)
                return dt.Field(el.name, t, nullable)
            is_list = (conv == int(fmt.ConvertedType.LIST) or
                       (el.logicalType is not None and
                        el.logicalType.LIST is not None))
            if is_list:
                mid = elements[pos[0]]
                pos[0] += 1
                # repeated group with single child
                child = read_node(path + (el.name, mid.name), d + 1, r + 1,
                                  ancestry + [el, mid])
                t = dt.list_(dt.Field("element", child.type, child.nullable))
                return dt.Field(el.name, t, nullable)
            fields = [read_node(path + (el.name,), d, r, ancestry + [el])
                      for _ in range(el.num_children)]
            st = dt.struct(fields)
            if (el.logicalType is not None
                    and el.logicalType.VARIANT is not None):
                from ..extensions import VariantType
                return dt.Field(el.name, VariantType(st), nullable)
            return dt.Field(el.name, st, nullable)
        t = arrow_type_of(el)
        leaves.append(ColumnDescriptor(
            path + (el.name,), fmt.Type(el.type), el.type_length or 0,
            d, r, t, ancestry + [el]))
        return dt.Field(el.name, t, nullable)

    root = elements[0]
    fields = [read_node((), 0, 0, []) for _ in range(root.num_children or 0)]
    return dt.Schema(fields), leaves
