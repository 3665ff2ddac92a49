/* Minimal stub of minml's Json header for the parity-oracle build: just
 * enough surface for the reference headers that use Json inline (notably
 * utils/Parameter.hpp's template bodies) to PARSE.  None of this is ever
 * executed — the oracle links no config/serialization code.  See VERDICT
 * round-1 task 5. */
#ifndef MINML_UTILS_JSON_HPP_
#define MINML_UTILS_JSON_HPP_

#include <cstddef>
#include <initializer_list>
#include <stdexcept>
#include <string>

enum class JsonType
{
	Null,
	Bool,
	Number,
	String,
	Array,
	Object
};

class Json
{
	public:
		Json() = default;
		explicit Json(JsonType)
		{
		}
		template<typename T>
		Json(const T&)
		{
		}
		Json(std::initializer_list<Json>)
		{
		}
		Json& operator[](const char*)
		{
			return *this;
		}
		Json& operator[](const std::string&)
		{
			return *this;
		}
		Json& operator[](size_t)
		{
			return *this;
		}
		Json& operator[](int)
		{
			return *this;
		}
		const Json& operator[](const char*) const
		{
			return *this;
		}
		const Json& operator[](const std::string&) const
		{
			return *this;
		}
		const Json& operator[](size_t) const
		{
			return *this;
		}
		const Json& operator[](int) const
		{
			return *this;
		}
		template<typename T>
		Json& operator=(const T&)
		{
			return *this;
		}
		bool isNull() const noexcept
		{
			return true;
		}
		bool isObject() const noexcept
		{
			return false;
		}
		bool isArray() const noexcept
		{
			return false;
		}
		bool isNumber() const noexcept
		{
			return false;
		}
		bool isString() const noexcept
		{
			return false;
		}
		bool isBool() const noexcept
		{
			return false;
		}
		bool hasKey(const std::string&) const noexcept
		{
			return false;
		}
		size_t size() const noexcept
		{
			return 0;
		}
		int getInt() const noexcept
		{
			return 0;
		}
		double getDouble() const noexcept
		{
			return 0.0;
		}
		bool getBool() const noexcept
		{
			return false;
		}
		std::string getString() const
		{
			return std::string();
		}
};

class SerializedObject;

#endif
